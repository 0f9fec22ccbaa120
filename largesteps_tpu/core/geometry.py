"""Mesh Laplacians and the large-steps system matrix ``M = I + λL``.

Reference semantics: largesteps/geometry.py (laplacian_uniform:65-94,
laplacian_cot:3-63, compute_matrix:96-133).  The TPU design differs:

* sparsity structure is built **on host** (numpy) once per topology epoch —
  topology only changes at remesh boundaries which are recompile boundaries;
* values live on device and, for the cotan Laplacian, are a differentiable
  jnp computation (gathers + segment coalesce, no dynamic shapes);
* no ``id()``-keyed implicit caching — matrices carry an explicit ``epoch``
  tag used by the solver cache (see parameterize.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sparse import CooStructure, SparseCOO

__all__ = [
    "laplacian_uniform",
    "laplacian_cot",
    "compute_matrix",
    "adjacency_edges",
]


def adjacency_edges(faces: np.ndarray):
    """Unique directed adjacency (i, j) pairs of a triangle mesh (host).

    Mirrors the edge extraction of the reference (largesteps/geometry.py:80-86):
    cyclic pairs of each face in both directions, deduplicated.
    """
    faces = np.asarray(faces)
    ii = faces[:, [1, 2, 0]].reshape(-1)
    jj = faces[:, [2, 0, 1]].reshape(-1)
    directed = np.stack(
        [np.concatenate([ii, jj]), np.concatenate([jj, ii])], axis=0
    )
    directed = np.unique(directed, axis=1)
    return directed[0], directed[1]


def laplacian_uniform(n_verts: int, faces: np.ndarray, dtype=jnp.float32) -> SparseCOO:
    """Combinatorial graph Laplacian: L = D - A (reference geometry.py:65-94).

    Off-diagonal −1 per unique undirected edge (in both directions), diagonal
    = vertex degree.  Pure topology ⇒ built entirely on host; values are a
    constant device array.
    """
    src, dst = adjacency_edges(faces)
    deg = np.bincount(src, minlength=n_verts).astype(np.float64)
    diag = np.arange(n_verts, dtype=np.int64)
    rows = np.concatenate([src, diag])
    cols = np.concatenate([dst, diag])
    vals = np.concatenate([-np.ones_like(src, dtype=np.float64), deg])
    st = CooStructure(rows, cols, (n_verts, n_verts))
    return SparseCOO(st, st.coalesce_values(jnp.asarray(vals, dtype=dtype)))


def _cot_structure(n_verts: int, faces: np.ndarray):
    """Host-side COO pattern for the cotan Laplacian: 6F off-diagonal entries
    (both directions of the 3 edges per face) followed by V diagonal entries."""
    faces = np.asarray(faces)
    ii = faces[:, [1, 2, 0]].reshape(-1)
    jj = faces[:, [2, 0, 1]].reshape(-1)
    diag = np.arange(n_verts, dtype=np.int64)
    rows = np.concatenate([ii, jj, diag])
    cols = np.concatenate([jj, ii, diag])
    return CooStructure(rows, cols, (n_verts, n_verts))


def laplacian_cot(verts: jax.Array, faces: np.ndarray) -> SparseCOO:
    """Cotangent Laplacian, differentiable w.r.t. ``verts``.

    Matches reference largesteps/geometry.py:3-63: Heron-formula areas
    clamped ≥ 1e-12, per-corner cot weights divided by 4·area... specifically
    cot_x = (b²+c²−a²)/area / 4, symmetrized, diagonal = column sums, and the
    final sign convention L = D − W.
    """
    faces = np.asarray(faces)
    n_verts = int(verts.shape[0])
    fv = verts[jnp.asarray(faces)]            # (F, 3, 3)
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]

    A = jnp.linalg.norm(v1 - v2, axis=1)      # opposite v0
    B = jnp.linalg.norm(v0 - v2, axis=1)      # opposite v1
    C = jnp.linalg.norm(v0 - v1, axis=1)      # opposite v2
    s = 0.5 * (A + B + C)
    area = jnp.sqrt(jnp.clip(s * (s - A) * (s - B) * (s - C), 1e-12, None))

    A2, B2, C2 = A * A, B * B, C * C
    cota = (B2 + C2 - A2) / area / 4.0
    cotb = (A2 + C2 - B2) / area / 4.0
    cotc = (A2 + B2 - C2) / area / 4.0
    # reference assembly: W[f1,f2]+=cota, W[f2,f0]+=cotb, W[f0,f1]+=cotc,
    # then symmetrize (geometry.py:44-56)
    w = jnp.stack([cota, cotb, cotc], axis=1).reshape(-1)  # per (face, corner)

    st = _cot_structure(n_verts, faces)
    # raw input order in _cot_structure: [w (ii→jj), w (jj→ii), diag zeros]
    ii = faces[:, [1, 2, 0]].reshape(-1)
    # off-diagonal of L is −W; diagonal of L is column-sums of W.
    colsum = jax.ops.segment_sum(
        jnp.concatenate([w, w]),
        jnp.asarray(np.concatenate([faces[:, [2, 0, 1]].reshape(-1), ii])),
        num_segments=n_verts,
    )
    raw = jnp.concatenate([-w, -w, colsum])
    return SparseCOO(st, st.coalesce_values(raw))


def compute_matrix(
    verts,
    faces,
    lambda_: float | None = None,
    alpha: float | None = None,
    cotan: bool = False,
) -> SparseCOO:
    """The parameterization matrix ``M = I + λL`` (or ``(1−α)I + αL``).

    Reference: largesteps/geometry.py:96-133, including the α∈[0,1) check.
    Returns a coalesced SparseCOO; symmetric positive definite for λ>0.
    """
    n_verts = int(verts.shape[0])
    if cotan:
        L = laplacian_cot(jnp.asarray(verts), faces)
    else:
        L = laplacian_uniform(n_verts, faces)

    if alpha is None:
        if lambda_ is None:
            raise ValueError("one of lambda_ / alpha must be given")
        return L.add_scaled_identity(1.0, self_scale=float(lambda_))
    if alpha < 0.0 or alpha >= 1.0:
        raise ValueError(
            f"alpha={alpha} out of range: need 0 <= alpha < 1"
        )
    return L.add_scaled_identity(1.0 - alpha, self_scale=float(alpha))
