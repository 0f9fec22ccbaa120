"""Algebraic-multigrid-preconditioned CG for large mesh systems.

The reference's large-mesh path is cholespy's CHOLMOD factorization
(largesteps/solvers.py:26-39): factor once per topology epoch, cheap
repeated solves.  Sparse triangular back-substitution is inherently
sequential and maps terribly onto a TPU, and the device-resident dense
inverse (core/solvers.py:CholeskySolver) stops paying for itself above
~32k vertices.  This module supplies the missing ≥100k-vertex tier: an
aggregation-based AMG **preconditioner** built once per epoch on host
(mirroring the reference's factor-once lifetime), applied on device as
pure gather/segment/matmul ops, wrapped in CG.

Why AMG (and not incomplete factorizations): every component of a V-cycle
— Jacobi smoothing, piecewise-constant restriction (``segment_sum`` over
aggregates), prolongation (gather), and a dense coarsest-level inverse on
the MXU — is a TPU-native primitive with static shapes.  ``M = I + λL``
is SPD with κ ≈ 1 + λ·λmax(L), so unpreconditioned CG needs hundreds of
iterations at 1e-6 (measured 1.23 s/solve at 163k verts in round 2);
the V-cycle cuts that to ~10-20.

Host setup (once per topology epoch):
  * greedy graph aggregation (root + unclaimed neighbors, then attach
    leftovers to the most-connected adjacent aggregate);
  * Galerkin coarse operator A_c = Pᵀ A P with piecewise-constant P —
    computed in numpy by relabeling COO coordinates with aggregate ids;
  * recurse until the coarsest level fits a dense MXU inverse.

Device apply: V(1,1)-cycle with weighted-Jacobi smoothing, recursion
unrolled at trace time (the hierarchy depth is static per epoch).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .sparse import SparseCOO, CooStructure, coo_matvec

__all__ = ["AmgHierarchy", "build_hierarchy", "vcycle", "amg_pcg_solve",
           "MultigridSolver"]


def _csr_from_coo(rows, cols, n):
    order = np.argsort(rows, kind="stable")
    rs, cs = rows[order], cols[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rs + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, cs


def greedy_aggregate(rows: np.ndarray, cols: np.ndarray, n: int) -> np.ndarray:
    """Vectorized greedy aggregation of the matrix graph (host).

    Round-based replacement for the original per-vertex Python loop (which
    measured 32-83 s at 163k vertices — ADVICE r3/r4): each round selects
    the vertices that are local MINIMA of a fixed random priority among
    still-unclaimed neighbors (an independent set, so their star aggregates
    never collide), claims each root's unclaimed neighbors, and repeats.
    Leftovers attach to the adjacent aggregate they share the most edges
    with; isolated vertices become singletons.  Every step is a bulk
    ``np.minimum.at``/``np.unique`` pass — O(E) per round, ~4 rounds.
    Returns agg_id (n,) int32 with ids in [0, n_aggregates).
    """
    off = rows != cols
    r = rows[off].astype(np.int64)
    c = cols[off].astype(np.int64)
    rng = np.random.default_rng(0)               # deterministic
    pri = rng.permutation(n).astype(np.int64)
    vert_of_pri = np.empty(n, np.int64)
    vert_of_pri[pri] = np.arange(n)
    agg = np.full(n, -1, np.int64)
    n_agg = 0

    for _round in range(8):
        unclaimed = agg < 0
        if not unclaimed.any():
            break
        m = unclaimed[r] & unclaimed[c]
        rr, cc = r[m], c[m]
        # local priority minima among unclaimed neighbors -> roots
        nb_min = np.full(n, n, np.int64)
        np.minimum.at(nb_min, rr, pri[cc])
        is_root = unclaimed & (pri < nb_min)
        roots = np.flatnonzero(is_root)
        if roots.size == 0:
            break
        agg[roots] = n_agg + np.arange(roots.size)
        n_agg += roots.size
        # claim: each unclaimed non-root joins its min-priority adjacent root
        best = np.full(n, n, np.int64)
        sel = unclaimed[rr] & ~is_root[rr] & is_root[cc]
        np.minimum.at(best, rr[sel], pri[cc[sel]])
        claimed = best < n
        agg[claimed] = agg[vert_of_pri[best[claimed]]]

    # attach leftovers to the most-connected neighboring aggregate,
    # iterating so chains of leftovers resolve (each pass is vectorized)
    for _ in range(8):
        left = agg < 0
        if not left.any():
            break
        m = left[r] & (agg[c] >= 0)
        if not m.any():
            break
        rr, cc = r[m], c[m]
        pair = rr * (n_agg + 1) + agg[cc]
        uniq, cnt = np.unique(pair, return_counts=True)
        v_of = uniq // (n_agg + 1)
        a_of = uniq % (n_agg + 1)
        order = np.lexsort((cnt, v_of))          # per-vertex ascending count
        last = np.flatnonzero(
            np.r_[v_of[order][1:] != v_of[order][:-1], True])
        pick = order[last]
        agg[v_of[pick]] = a_of[pick]
    isolated = np.flatnonzero(agg < 0)
    if isolated.size:
        agg[isolated] = n_agg + np.arange(isolated.size)
        n_agg += isolated.size
    return agg.astype(np.int32)


def _apply_op(op, x):
    """Matvec dispatch: SparseCOO (gather/segment) or BlockedOperator (MXU
    dense-block) — both registered pytrees, so levels pass through jit as
    arguments (no program-embedded constants — the round-3 HTTP 413 fix)."""
    from .blocksp import BlockedOperator
    if isinstance(op, BlockedOperator):
        return op.matvec(x)
    return coo_matvec(op, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _Level:
    op: object                        # SparseCOO | BlockedOperator
    inv_diag: jax.Array               # 1 / diag(A)
    agg: jax.Array | None             # fine row -> coarse aggregate id
    n_coarse: int | None              # static

    def tree_flatten(self):
        return (self.op, self.inv_diag, self.agg), self.n_coarse

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AmgHierarchy:
    levels: list                      # of _Level, fine -> coarse
    coarse_inv: jax.Array             # dense inverse at the coarsest level
    omega: float = 0.8                # static

    def tree_flatten(self):
        return (self.levels, self.coarse_inv), self.omega

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def build_hierarchy(M: SparseCOO, coarse_limit: int = 4096,
                    max_levels: int = 6, omega: float = 0.8,
                    block_limit: int | None = None,
                    block: int = 128) -> AmgHierarchy:
    """Build the AMG hierarchy for SPD ``M`` (host setup, device arrays).

    Levels with ≥ ``block_limit`` rows get the dense-block MXU matvec
    (core/blocksp.py) instead of the COO gather/segment one; ``M`` must
    already be bandwidth-ordered for the block form to be worthwhile.
    """
    from .blocksp import BlockedOperator

    def make_op(A):
        if block_limit is not None and A.shape[0] >= block_limit:
            return BlockedOperator(A, np.arange(A.shape[0], dtype=np.int64),
                                   block)
        return A

    levels = []
    rows = M.structure.rows.astype(np.int64)
    cols = M.structure.cols.astype(np.int64)
    vals = np.asarray(jax.device_get(M.vals), np.float64)
    n = M.shape[0]
    A = M

    while n > coarse_limit and len(levels) < max_levels:
        agg = greedy_aggregate(rows.astype(np.int32), cols.astype(np.int32), n)
        n_c = int(agg.max()) + 1
        if n_c >= n:       # aggregation stalled
            break
        levels.append(_Level(
            op=make_op(A), inv_diag=1.0 / A.diagonal(),
            agg=jnp.asarray(agg), n_coarse=n_c,
        ))
        # Galerkin coarse operator: relabel + coalesce (numpy, f64)
        rc = agg[rows].astype(np.int64)
        cc = agg[cols].astype(np.int64)
        lin = rc * n_c + cc
        uniq, inv = np.unique(lin, return_inverse=True)
        v_c = np.zeros(len(uniq), np.float64)
        np.add.at(v_c, inv, vals)
        rows, cols = uniq // n_c, uniq % n_c
        vals = v_c
        st = CooStructure(rows.astype(np.int32), cols.astype(np.int32),
                          (n_c, n_c))
        # CooStructure re-sorts; map values into its slot order
        v_sorted = np.zeros(st.nnz, np.float64)
        np.add.at(v_sorted, st.slot, vals)
        A = SparseCOO(st, jnp.asarray(v_sorted, jnp.float32))
        rows = st.rows.astype(np.int64)
        cols = st.cols.astype(np.int64)
        vals = v_sorted
        n = n_c

    # coarsest: dense inverse on the MXU (f32, HIGHEST precision)
    dense = np.zeros((n, n), np.float64)
    dense[rows, cols] = vals
    with jax.default_matmul_precision("highest"):
        c, low = jax.scipy.linalg.cho_factor(jnp.asarray(dense, jnp.float32))
        inv = jax.scipy.linalg.cho_solve((c, low), jnp.eye(n, dtype=jnp.float32))
    levels.append(_Level(op=make_op(A), inv_diag=1.0 / A.diagonal(), agg=None,
                         n_coarse=None))
    return AmgHierarchy(levels=levels, coarse_inv=jax.block_until_ready(inv),
                        omega=omega)


def vcycle(h: AmgHierarchy, b: jax.Array, lvl: int = 0) -> jax.Array:
    """One V(1,1)-cycle approximating A⁻¹ b at level ``lvl`` (traced)."""
    level = h.levels[lvl]
    if lvl == len(h.levels) - 1:
        return jnp.matmul(h.coarse_inv, b,
                          precision=jax.lax.Precision.HIGHEST)
    om = h.omega
    d = level.inv_diag[:, None] if b.ndim == 2 else level.inv_diag
    # pre-smooth from zero: x = ω D⁻¹ b
    x = om * d * b
    r = b - _apply_op(level.op, x)
    agg = level.agg
    r_c = jax.ops.segment_sum(r, agg, num_segments=level.n_coarse)
    x = x + vcycle(h, r_c, lvl + 1)[agg]
    # post-smooth
    x = x + om * d * (b - _apply_op(level.op, x))
    return x


def amg_pcg_solve(h: AmgHierarchy, b: jax.Array, x0: jax.Array | None = None,
                  tol: float = 1e-6, max_iter: int = 100) -> jax.Array:
    """Preconditioned CG with the V-cycle as preconditioner.

    Per-RHS α/β scalars, converged columns frozen — the same contract as
    core.solvers.cg_solve (reference semantics largesteps/solvers.py:58-84).
    """
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
        x0 = None if x0 is None else x0[:, None]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    matvec = lambda x: _apply_op(h.levels[0].op, x)

    r0 = b - matvec(x0)
    z0 = vcycle(h, r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=0)
    rn0 = jnp.linalg.norm(r0, axis=0)

    def cond(state):
        _, _, _, _, r_norm, it = state
        return jnp.logical_and(jnp.any(r_norm > tol), it < max_iter)

    def body(state):
        x, r, p, rz, r_norm, it = state
        active = r_norm > tol
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = jnp.where(active, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[None, :] * p
        r_new = r - alpha[None, :] * Ap
        z_new = vcycle(h, r_new)
        rz_new = jnp.sum(r_new * z_new, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = jnp.where(active[None, :], z_new + beta[None, :] * p, p)
        r = jnp.where(active[None, :], r_new, r)
        r_norm = jnp.where(active, jnp.linalg.norm(r_new, axis=0), r_norm)
        rz = jnp.where(active, rz_new, rz)
        return x, r, p, rz, r_norm, it + 1

    x, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, rn0, jnp.int32(0)))
    return x[:, 0] if squeeze else x


@jax.tree_util.register_pytree_node_class
class MultigridSolver:
    """AMG-PCG solver with the reference solver-object surface
    (factor-once-per-epoch lifetime, repeated cheap solves; the TPU
    fallback tier for meshes whose RCM bandwidth defeats the banded
    direct solver, core/banded.py)."""

    method = "AMG"

    def __init__(self, M: SparseCOO, tol: float = 1e-6,
                 coarse_limit: int = 4096, block_limit: int | None = None):
        self.M = M
        self.tol = tol
        self.h = build_hierarchy(M, coarse_limit=coarse_limit,
                                 block_limit=block_limit)

    def solve(self, b, x0=None):
        return amg_pcg_solve(self.h, b, x0=x0, tol=self.tol)

    def tree_flatten(self):
        return (self.M, self.h), self.tol

    @classmethod
    def tree_unflatten(cls, aux, children):
        slv = object.__new__(cls)
        slv.M, slv.h = children
        slv.tol = aux
        return slv
