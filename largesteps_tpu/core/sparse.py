"""Sparse matrices for TPU: static-structure COO with segment-sum matvec.

Design (TPU-first, not a port):

The reference holds mesh Laplacians as ``torch.sparse_coo_tensor`` and relies
on CUDA ``coalesce()``/``sparse @ dense`` (reference: largesteps/geometry.py:94,133,
largesteps/parameterize.py:30). XLA has no sparse tensor type and TPUs want
static shapes, so we split a sparse matrix into

  * a **host-built static structure** (:class:`CooStructure`) — numpy index
    arrays computed once per mesh-topology epoch (topology only changes at
    remesh boundaries, which are recompile boundaries anyway), and
  * **traced values** — a jnp array, differentiable (needed for the cotan
    Laplacian whose weights depend on vertex positions).

Duplicate coordinates produced during assembly are coalesced through a
precomputed ``slot`` mapping + ``segment_sum`` so the compiled graph is pure
gather/segment ops with static shapes.  Matvec is
``segment_sum(vals * x[cols], rows)`` with rows pre-sorted on host so XLA can
lower it to an efficient sorted-segment reduction.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class CooStructure:
    """Static (host-side) sparsity structure of a coalesced COO matrix.

    Attributes
    ----------
    rows, cols : np.ndarray int32, shape (nnz,)
        Coalesced coordinates, sorted lexicographically by (row, col).
    shape : (int, int)
    diag_slots : np.ndarray int32, shape (n,)
        For square matrices with a full diagonal: slot index of entry (i, i).
        ``-1`` where the diagonal entry is absent from the pattern.
    """

    def __init__(self, rows, cols, shape):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        n_rows, n_cols = shape
        # Lexicographic sort by (row, col) and coalesce duplicates.
        lin = rows * n_cols + cols
        order = np.argsort(lin, kind="stable")
        lin_sorted = lin[order]
        uniq_lin, first_idx, slot_of_sorted = np.unique(
            lin_sorted, return_index=True, return_inverse=True
        )
        # slot[k] = coalesced slot of input entry k
        slot = np.empty_like(slot_of_sorted)
        slot[order] = slot_of_sorted
        self.slot = slot.astype(np.int32)
        self.rows = (uniq_lin // n_cols).astype(np.int32)
        self.cols = (uniq_lin % n_cols).astype(np.int32)
        self.shape = (int(n_rows), int(n_cols))
        self.n_input = int(rows.shape[0])

        if n_rows == n_cols:
            diag_lin = np.arange(n_rows, dtype=np.int64) * n_cols + np.arange(
                n_rows, dtype=np.int64
            )
            pos = np.searchsorted(uniq_lin, diag_lin)
            pos = np.clip(pos, 0, len(uniq_lin) - 1)
            found = uniq_lin[pos] == diag_lin
            self.diag_slots = np.where(found, pos, -1).astype(np.int32)
        else:
            self.diag_slots = None

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    def coalesce_values(self, raw_vals: jax.Array) -> jax.Array:
        """Sum duplicate-coordinate input values into coalesced slots."""
        return jax.ops.segment_sum(raw_vals, jnp.asarray(self.slot), num_segments=self.nnz)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseCOO:
    """Coalesced sparse COO matrix: static structure + traced values.

    ``structure`` is auxiliary (static) pytree data; ``vals`` is the only
    traced leaf, so these objects pass freely through ``jit``/``grad``.
    """

    structure: CooStructure
    vals: jax.Array

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.vals,), self.structure

    @classmethod
    def tree_unflatten(cls, structure, leaves):
        return cls(structure=structure, vals=leaves[0])

    # -- properties ------------------------------------------------------
    @property
    def shape(self):
        return self.structure.shape

    @property
    def nnz(self):
        return self.structure.nnz

    @property
    def rows(self):
        return jnp.asarray(self.structure.rows)

    @property
    def cols(self):
        return jnp.asarray(self.structure.cols)

    # -- ops -------------------------------------------------------------
    def __matmul__(self, x: jax.Array) -> jax.Array:
        return coo_matvec(self, x)

    def transpose(self) -> "SparseCOO":
        st = CooStructure(self.structure.cols, self.structure.rows, self.shape[::-1])
        # re-permute values into the transposed (sorted) order
        n_cols_t = self.shape[0]
        lin_t = (
            self.structure.cols.astype(np.int64) * n_cols_t
            + self.structure.rows.astype(np.int64)
        )
        order = np.argsort(lin_t, kind="stable")
        return SparseCOO(st, self.vals[jnp.asarray(order.astype(np.int32))])

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)

    def scale(self, s) -> "SparseCOO":
        return SparseCOO(self.structure, self.vals * s)

    def add_scaled_identity(self, diag_scale, self_scale=1.0) -> "SparseCOO":
        """Return ``self_scale * A + diag_scale * I`` (structure must contain
        the full diagonal, which mesh Laplacians always do)."""
        ds = self.structure.diag_slots
        if ds is None or (ds < 0).any():
            raise ValueError("structure does not contain the full diagonal")
        vals = self.vals * self_scale
        vals = vals.at[jnp.asarray(ds)].add(diag_scale)
        return SparseCOO(self.structure, vals)

    def diagonal(self) -> jax.Array:
        ds = self.structure.diag_slots
        if ds is None:
            raise ValueError("not square")
        d = self.vals[jnp.asarray(np.where(ds < 0, 0, ds))]
        return jnp.where(jnp.asarray(ds) < 0, 0.0, d)


def from_coo(rows, cols, raw_vals, shape) -> SparseCOO:
    """Build a coalesced SparseCOO from (possibly duplicated) coordinates.

    rows/cols must be host (numpy) arrays — the structure is static.
    raw_vals may be a traced jnp array (duplicates are segment-summed).
    """
    st = CooStructure(rows, cols, shape)
    return SparseCOO(st, st.coalesce_values(jnp.asarray(raw_vals)))


@partial(jax.jit, static_argnames=("n_rows",))
def _matvec_impl(rows, cols, vals, x, n_rows):
    contrib = vals[:, None] * x[cols]
    y = jax.ops.segment_sum(
        contrib, rows, num_segments=n_rows, indices_are_sorted=True
    )
    return y


def coo_matvec(A: SparseCOO, x: jax.Array) -> jax.Array:
    """``A @ x`` for dense x of shape (n,) or (n, k).

    Lowered to gather + sorted segment_sum, which XLA maps onto the VPU with
    no dynamic shapes (reference semantics: torch sparse mm,
    largesteps/parameterize.py:30, largesteps/solvers.py:70-74).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    y = _matvec_impl(A.rows, A.cols, A.vals, x, A.shape[0])
    return y[:, 0] if squeeze else y
