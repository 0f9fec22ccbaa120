"""Dense-block sparse matvec on the MXU — the large-mesh solver's engine.

Problem: XLA gathers/scatters run at ~8 ns/row on this chip, so any
per-nonzero formulation of ``A @ x`` (segment_sum COO, padded-row ELL)
floors at ~5 ms for the 1.1M-nonzero Laplacian system of a 163k-vertex
mesh — and an AMG-PCG solve built on it costs ~400 ms (measured round 3).

TPU design: reorder vertices with reverse Cuthill-McKee (bandwidth ~640 at
163k), partition rows into groups of B=128 (the lane width), and store
every nonzero (row-group, col-group) pair as a DENSE B×B block.  The
matvec is then three tile-friendly ops, no per-element addressing:

    xg       = take(x_grouped, col_group)      # (NB, B, k) slice gather
    y_blocks = blocks @ xg                     # batched MXU matmul
    y        = segment_sum(y_blocks, row_group)  # NB≈8/group, sorted

At 163k vertices: 10.2k blocks = 669 MB f32 resident, ~0.8 ms of HBM
traffic per matvec — ~6× faster than ELL and 20× faster than COO
(block-sparsity trades 20× zero-padding FLOPs, which the MXU shrugs off,
for the elimination of all fine-grained addressing).

The solve lives entirely in permuted space; callers permute b/x once per
solve at the boundary (one V-row gather each way).

Reference semantics being replaced: cholespy's host CHOLMOD factorization
(largesteps/solvers.py:26-39) — infeasible here because the axon TPU
client supports no host callbacks and tunnel uploads cost ~85 ms.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sparse import SparseCOO, CooStructure

__all__ = ["BlockedOperator", "rcm_permutation"]


def rcm_permutation(rows, cols, n):
    """Reverse Cuthill-McKee ordering of the matrix graph (host)."""
    from scipy import sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                      shape=(n, n)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                      dtype=np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    return perm, inv


class BlockedOperator:
    """Dense-block form of a sparse SPD operator, in a given ordering.

    ``matvec(xp)`` maps permuted (n_pad, k) → permuted (n_pad, k).
    """

    def __init__(self, M: SparseCOO, inv_perm: np.ndarray, block: int = 128):
        st = M.structure
        n = st.shape[0]
        B = int(block)
        self.n = n
        self.block = B
        self.n_pad = ((n + B - 1) // B) * B
        G = self.n_pad // B
        self.groups = G

        vals = np.asarray(jax.device_get(M.vals), np.float64)
        r2 = inv_perm[st.rows.astype(np.int64)]
        c2 = inv_perm[st.cols.astype(np.int64)]
        gr, gc = r2 // B, c2 // B
        pair = gr * G + gc
        uniq, pair_idx = np.unique(pair, return_inverse=True)
        NB = len(uniq)
        blocks = np.zeros((NB, B, B), np.float32)
        np.add.at(blocks, (pair_idx, r2 % B, c2 % B), vals)
        # uniq is sorted by (row_group, col_group) → row_group ascending,
        # as segment_sum(indices_are_sorted=True) requires
        self.row_group = jnp.asarray((uniq // G).astype(np.int32))
        self.col_group = jnp.asarray((uniq % G).astype(np.int32))
        self.blocks = jnp.asarray(blocks)
        self.n_blocks = NB
        self.hbm_bytes = int(blocks.nbytes)

    def matvec(self, xp: jax.Array) -> jax.Array:
        """Permuted-space ``A @ x``; xp (n_pad, k)/(n,) — shorter inputs are
        zero-padded to ``n_pad`` and the result sliced back to match."""
        squeeze = xp.ndim == 1
        if squeeze:
            xp = xp[:, None]
        n_in = xp.shape[0]
        if n_in < self.n_pad:
            xp = jnp.pad(xp, ((0, self.n_pad - n_in), (0, 0)))
        k = xp.shape[1]
        xg = xp.reshape(self.groups, self.block, k)
        xb = jnp.take(xg, self.col_group, axis=0)          # (NB, B, k)
        yb = jax.lax.dot_general(
            self.blocks, xb,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (NB, B, k)
        yg = jax.ops.segment_sum(yb, self.row_group,
                                 num_segments=self.groups,
                                 indices_are_sorted=True)
        y = yg.reshape(self.n_pad, k)[:n_in]
        return y[:, 0] if squeeze else y

    __call__ = matvec


def _flatten_bop(op):
    return ((op.blocks, op.row_group, op.col_group),
            (op.n, op.block, op.n_pad, op.groups, op.n_blocks, op.hbm_bytes))


def _unflatten_bop(aux, children):
    op = object.__new__(BlockedOperator)
    op.blocks, op.row_group, op.col_group = children
    op.n, op.block, op.n_pad, op.groups, op.n_blocks, op.hbm_bytes = aux
    return op


jax.tree_util.register_pytree_node(BlockedOperator, _flatten_bop, _unflatten_bop)


def permuted_coo(M: SparseCOO, inv_perm: np.ndarray,
                 n_pad: int | None = None) -> SparseCOO:
    """Relabel a SparseCOO by a permutation (host restructure, same vals
    modulo slot order), optionally padding the shape; padded rows get an
    identity diagonal so the operator stays SPD on the padding."""
    st = M.structure
    n = st.shape[0]
    vals = np.asarray(jax.device_get(M.vals), np.float64)
    r2 = inv_perm[st.rows.astype(np.int64)]
    c2 = inv_perm[st.cols.astype(np.int64)]
    if n_pad is None:
        n_pad = n
    if n_pad > n:
        extra = np.arange(n, n_pad, dtype=np.int64)
        r2 = np.concatenate([r2, extra])
        c2 = np.concatenate([c2, extra])
        vals = np.concatenate([vals, np.ones(len(extra))])
    st2 = CooStructure(r2, c2, (n_pad, n_pad))
    v_sorted = np.zeros(st2.nnz, np.float64)
    np.add.at(v_sorted, st2.slot, vals)
    return SparseCOO(st2, jnp.asarray(v_sorted, jnp.float32))
