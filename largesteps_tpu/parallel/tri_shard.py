"""Triangle/vertex sharding: edge-sharded solver math and vertex-sharded
gradient reduction (SURVEY §2.3 "TP analog" and "solver parallelism").

The reference has no distributed code at all (SURVEY §2.3); these are the
TPU-native equivalents of the two mesh-sized hot reductions:

  * **Edge (nnz) sharding for the sparse matvec** — the CG solve's matvec
    (reference spec largesteps/solvers.py:58-84) is
    ``segment_sum(vals · x[cols], rows)`` over the Laplacian's nnz entries.
    Each device owns a static 1/ndev slice of the (pre-sorted, padded)
    coordinate arrays, computes its partial per-vertex sums locally, and one
    ``psum`` over the mesh axes produces the replicated result.  The
    per-device work drops by ndev while the communicated payload stays the
    (n, k) solution-sized vector — the right trade on ICI.
  * **Vertex sharding for the face→vertex gradient gather** — the render
    backward's per-(face, corner) gradient table is reduced to per-vertex
    sums through a static padded incidence gather
    (pallas_core._scatter_via_faces).  Sharded form: every device gathers
    only its V/ndev vertex rows (the table stays replicated — it is
    camera-sharded already under the renderer's shard_map), then an
    ``all_gather`` reassembles the replicated (V, ·) gradient.

Both are exercised by tests/test_tri_shard.py (8-device CPU mesh, allclose
vs the replicated implementations) and by the multichip dryrun.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.sparse import SparseCOO, CooStructure

__all__ = ["EdgeShards", "sharded_coo_matvec", "sharded_cg_solve",
           "ShardedCGSolver", "sharded_vertex_gather"]


class EdgeShards:
    """Static per-device slices of a CooStructure's nnz entries.

    Pads nnz to a multiple of ``n_shards`` with sentinel entries pointing at
    row/col ``n`` (an extra segment that is dropped), then reshapes to
    (n_shards, S).  Host-built once per topology epoch, like the structure
    itself.
    """

    def __init__(self, structure: CooStructure, n_shards: int):
        nnz = structure.nnz
        self.n = structure.shape[0]
        self.n_shards = int(n_shards)
        S = -(-nnz // self.n_shards)
        pad = S * self.n_shards - nnz
        self.pad = pad
        self.rows = np.pad(structure.rows, (0, pad),
                           constant_values=self.n).reshape(n_shards, S)
        self.cols = np.pad(structure.cols, (0, pad),
                           constant_values=self.n).reshape(n_shards, S)

    def pad_vals(self, vals: jax.Array) -> jax.Array:
        """Pad + reshape the traced value vector to (n_shards, S)."""
        return jnp.pad(vals, (0, self.pad)).reshape(self.n_shards, -1)


def _local_matvec(rows, cols, vals, x, n):
    """Partial matvec over one device's nnz slice; sentinel entries land in
    segment ``n`` and are dropped."""
    contrib = vals[:, None] * x[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=n + 1,
                               indices_are_sorted=True)[:n]


def sharded_coo_matvec(M: SparseCOO, x: jax.Array, mesh: Mesh,
                       axes=("dp", "sp"), shards: EdgeShards | None = None):
    """``M @ x`` with the nnz entries sharded over ``axes`` of ``mesh``.

    x replicated (n, k) → replicated (n, k); one psum of the output.
    """
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    ndev = int(np.prod([mesh.shape[a] for a in axes]))
    if shards is None:
        shards = EdgeShards(M.structure, ndev)
    n = shards.n
    spec = P(axes)

    def local(rows, cols, vals, xx):
        y = _local_matvec(rows[0], cols[0], vals[0], xx, n)
        return jax.lax.psum(y, axes)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, P()), out_specs=P(),
        check_vma=False,
    )(jnp.asarray(shards.rows), jnp.asarray(shards.cols),
      shards.pad_vals(M.vals), x)


def sharded_cg_solve(M: SparseCOO, b: jax.Array, mesh: Mesh,
                     axes=("dp", "sp"), x0=None, tol: float = 1e-5,
                     max_iter: int = 10000,
                     shards: EdgeShards | None = None) -> jax.Array:
    """Batched CG (identical math to core.solvers.cg_solve — per-RHS α/β,
    masked convergence, reference spec largesteps/solvers.py:58-84) with the
    matvec's nnz axis sharded over the mesh.

    The whole loop runs inside ONE shard_map: vectors (n, k) are replicated
    (they are solution-sized, a few MB at 163k verts), each device's matvec
    contribution is its nnz slice, and a single psum per iteration merges
    them.  Reductions for α/β run on replicated vectors (no collective).
    """
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    ndev = int(np.prod([mesh.shape[a] for a in axes]))
    if shards is None:
        shards = EdgeShards(M.structure, ndev)
    n = shards.n
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
        x0 = None if x0 is None else x0[:, None]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    spec = P(axes)

    def run(rows, cols, vals, bb, xx0):
        rows, cols, vals = rows[0], cols[0], vals[0]

        def matvec(x):
            return jax.lax.psum(_local_matvec(rows, cols, vals, x, n), axes)

        r0 = matvec(xx0) - bb
        p0 = -r0
        rn0 = jnp.linalg.norm(r0, axis=0)

        def cond(state):
            _, _, _, r_norm, it = state
            return jnp.logical_and(jnp.any(r_norm > tol), it < max_iter)

        def body(state):
            x, r, p, r_norm, it = state
            active = (r_norm > tol)
            Ap = matvec(p)
            r2 = r_norm ** 2
            pAp = jnp.sum(p * Ap, axis=0)
            alpha = jnp.where(active, r2 / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha[None, :] * p
            r_new = r + alpha[None, :] * Ap
            r_new_norm = jnp.linalg.norm(r_new, axis=0)
            beta = jnp.where(active,
                             r_new_norm ** 2 / jnp.where(r2 == 0, 1.0, r2),
                             0.0)
            p = jnp.where(active[None, :], -r_new + beta[None, :] * p, p)
            r = jnp.where(active[None, :], r_new, r)
            r_norm = jnp.where(active, r_new_norm, r_norm)
            return x, r, p, r_norm, it + 1

        x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (xx0, r0, p0, rn0, jnp.int32(0)))
        return x

    x = jax.shard_map(
        run, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P()), out_specs=P(),
        check_vma=False,
    )(jnp.asarray(shards.rows), jnp.asarray(shards.cols),
      shards.pad_vals(M.vals), b, x0)
    return x[:, 0] if squeeze else x


@jax.tree_util.register_pytree_node_class
class ShardedCGSolver:
    """Solver-surface wrapper around :func:`sharded_cg_solve` so the driver
    can thread it through ``core.solvers.solve`` (the differentiable
    custom_vjp) exactly like the single-device solvers.  The mesh and the
    static edge shards ride as aux data; only the matrix values are traced.
    """

    method = "CG"
    tier = "sharded_cg"

    def __init__(self, M: SparseCOO, mesh: Mesh, axes=("dp", "sp"),
                 tol: float = 1e-5):
        axes = (axes,) if isinstance(axes, str) else tuple(axes)
        ndev = int(np.prod([mesh.shape[a] for a in axes]))
        self.M = M
        self.mesh = mesh
        self.axes = axes
        self.tol = tol
        self.shards = EdgeShards(M.structure, ndev)

    def solve(self, b, x0=None):
        return sharded_cg_solve(self.M, b, self.mesh, axes=self.axes,
                                x0=x0, tol=self.tol, shards=self.shards)

    def tree_flatten(self):
        return (self.M,), (self.mesh, self.axes, self.tol, self.shards)

    @classmethod
    def tree_unflatten(cls, aux, children):
        slv = object.__new__(cls)
        slv.M = children[0]
        slv.mesh, slv.axes, slv.tol, slv.shards = aux
        return slv


def sharded_vertex_gather(per_corner, incidence, mesh, axes=("dp", "sp")):
    """Face-table → per-vertex gradient reduction with the VERTEX axis
    sharded: each device gathers only its V/ndev rows of the static padded
    incidence (pallas_core.build_incidence), then all_gather reassembles
    the replicated result.

    per_corner: (C, (F+1)·3 [+pad], Q) replicated corner-major table;
    incidence: (idx (V, K), mask (V, K)).  Returns (C, V, Q) summed over
    each vertex's incident corners — allclose to the replicated gather in
    pallas_core._scatter_via_faces.
    """
    axes = (axes,) if isinstance(axes, str) else tuple(axes)
    ndev = int(np.prod([mesh.shape[a] for a in axes]))
    idx, mask = incidence
    V, K = idx.shape
    pad = (-V) % ndev
    # padded vertex rows gather the sentinel (all-zero) corner row
    sentinel = per_corner.shape[1] - 1
    idx_p = np.pad(idx, ((0, pad), (0, 0)), constant_values=sentinel)
    mask_p = np.pad(mask, ((0, pad), (0, 0)))
    idx_s = idx_p.reshape(ndev, -1, K)
    mask_s = mask_p.astype(np.float32).reshape(ndev, -1, K)

    def local(idx_l, mask_l, table):
        g = jnp.take(table, idx_l[0].reshape(-1), axis=1)
        g = g.reshape(table.shape[0], *idx_l.shape[1:], table.shape[-1])
        g = g * mask_l[0][None, :, :, None]
        dv = g.sum(axis=2)                       # (C, V/ndev, Q)
        return jax.lax.all_gather(dv, axes, axis=1, tiled=True)

    spec = P(None, axes, None)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axes), P(axes), P()), out_specs=P(),
        check_vma=False,
    )(jnp.asarray(idx_s), jnp.asarray(mask_s), per_corner)
    return out[:, :V]
