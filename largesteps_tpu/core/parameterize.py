"""Differential parameterization: u = M v and its cached inverse.

Reference: largesteps/parameterize.py.  ``to_differential`` is one sparse
matvec (parameterize.py:19-30).  ``from_differential`` (parameterize.py:32-61)
caches one solver per matrix.

The reference keys its cache on ``id(M)`` with a weakref finalizer
(parameterize.py:4-17) — fragile under JAX where traced arrays have no stable
identity.  Here the cache keys on the identity of the matrix's *static host
structure* (``CooStructure``), which is stable across jit traces and is
replaced wholesale at remesh boundaries, giving exactly the reference's
lifetime semantics (new topology ⇒ new structure object ⇒ new factorization;
old entry dropped when the old structure is garbage collected).
"""
from __future__ import annotations

import weakref

from .sparse import SparseCOO, coo_matvec
from .solvers import (CholeskySolver, CholeskyHostSolver,
                      ConjugateGradientSolver, solve)

__all__ = ["to_differential", "from_differential", "clear_cache", "get_solver"]

_cache: dict = {}


def _cache_put(key, value, structure):
    def _cleanup(wr):
        _cache.pop(key, None)

    wr = weakref.ref(structure, _cleanup)
    _cache[key] = (value, wr)


def clear_cache():
    _cache.clear()


def to_differential(M: SparseCOO, v):
    """u = M v  (reference parameterize.py:19-30)."""
    return coo_matvec(M, v)


def get_solver(M: SparseCOO, method: str = "Cholesky"):
    """Lookup-or-build the cached solver for M (parameterize.py:48-59)."""
    key = (id(M.structure), method)
    if key not in _cache:
        if method == "Cholesky":
            slv = CholeskySolver(M)
        elif method == "CholeskyHost":
            slv = CholeskyHostSolver(M)
        elif method == "CG":
            slv = ConjugateGradientSolver(M)
        elif method == "AMG":
            from .multigrid import MultigridSolver
            slv = MultigridSolver(M)
        else:
            raise ValueError(f"Unknown solver type '{method}'.")
        _cache_put(key, slv, M.structure)
    else:
        slv = _cache[key][0]
    return slv


def from_differential(M: SparseCOO, u, method: str = "Cholesky",
                      guess_fwd=None, guess_bwd=None):
    """v = M⁻¹ u, differentiable, cached (reference parameterize.py:32-61).

    Warm-start guesses (CG only) are optional explicit arguments — the
    functional replacement for the reference's mutable solver state
    (solvers.py:102-124).
    """
    return solve(get_solver(M, method), u, guess_fwd=guess_fwd, guess_bwd=guess_bwd)
