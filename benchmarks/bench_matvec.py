"""Compare sparse matvec formulations and large-mesh solver tiers at large V
on the current backend (run on the TPU chip).

  coo    — gather + sorted segment_sum (scatter-add)
  ell    — padded-row gather-only form (lives here: it lost the bake-off
           to the dense-block form and is kept only as a benchmark probe)
  block  — RCM + dense-block MXU matvec (core/blocksp.py)
  banded — block-tridiagonal LDLᵀ direct solve (core/banded.py)
  amg    — AMG-PCG solve (V-cycle preconditioner)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


# --- ELL (padded-row, gather-only) matvec --------------------------------
# TPU rationale probed here: segment_sum lowers to scatter-add, which XLA
# serializes; a matvec built ONLY from gathers vectorizes.  Mesh Laplacians
# have tiny near-uniform row degree, so padding rows to the max degree K is
# cheap.  Measured round 3: ~6× slower than the dense-block form, so this
# stays a benchmark-only formulation.

class EllStructure:
    def __init__(self, st):
        n = st.shape[0]
        counts = np.bincount(st.rows, minlength=n)
        K = int(counts.max())
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        k_idx = np.arange(K)[None, :]
        valid = k_idx < counts[:, None]                     # (n, K)
        slot = np.where(valid, offsets[:-1, None] + k_idx, 0)
        self.col = np.where(valid, st.cols[slot], 0).astype(np.int32)
        self.slot = slot.astype(np.int32)
        self.mask = valid
        self.K = K
        self.n = n


def ell_matvec_fn(A):
    ell = EllStructure(A.structure)
    vals = A.vals

    def mv(x):
        w = vals[jnp.asarray(ell.slot)] * jnp.asarray(ell.mask, vals.dtype)
        xi = jnp.take(x, jnp.asarray(ell.col).reshape(-1), axis=0)
        if x.ndim == 1:
            return (w * xi.reshape(ell.n, ell.K)).sum(axis=1)
        return (w[..., None] * xi.reshape(ell.n, ell.K, x.shape[1])).sum(axis=1)

    return mv


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def chain_time(body, x0, iters, label):
    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda i, x_: body(x_), x)

    fetch(chain(x0))
    t0 = time.perf_counter()
    fetch(chain(x0))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:24s} {ms:9.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=7)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from largesteps_tpu.ops.shapes import icosphere
    from largesteps_tpu.core.geometry import compute_matrix
    from largesteps_tpu.core.sparse import coo_matvec
    from largesteps_tpu.core.blocksp import (rcm_permutation, permuted_coo,
                                             BlockedOperator)
    from largesteps_tpu.core.banded import BandedSolver
    from largesteps_tpu.core import multigrid

    print(f"backend: {jax.default_backend()}", flush=True)
    v, f = icosphere(args.subdiv)
    n = v.shape[0]
    M = compute_matrix(v, f, lambda_=19.0)
    print(f"V={n} nnz={M.nnz}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, 3)), jnp.float32)

    mv_ell = ell_matvec_fn(M)
    chain_time(lambda y: coo_matvec(M, y) * 1e-3, x, args.iters, "coo matvec")
    chain_time(lambda y: mv_ell(y) * 1e-3, x, args.iters, "ell matvec")

    st = M.structure
    perm, inv = rcm_permutation(st.rows, st.cols, n)
    n_pad = ((n + 127) // 128) * 128
    Mp = permuted_coo(M, inv, n_pad)
    op = BlockedOperator(Mp, np.arange(n_pad, dtype=np.int64), 128)
    xp = jnp.pad(x[jnp.asarray(perm)], ((0, n_pad - n), (0, 0)))
    chain_time(lambda y: op.matvec(y) * 1e-3, xp, args.iters, "block matvec")

    u = coo_matvec(M, x)

    t0 = time.perf_counter()
    banded = BandedSolver(M, refine=1)
    print(f"banded LDLt setup        {time.perf_counter()-t0:9.3f} s", flush=True)
    chain_time(lambda y: banded.solve(u + 1e-6 * y), jnp.zeros_like(u),
               max(args.iters // 5, 3), "banded LDLt solve")
    err = jnp.linalg.norm(coo_matvec(M, banded.solve(u)) - u) / jnp.linalg.norm(u)
    print(f"  rel residual: {float(err):.2e}", flush=True)

    t0 = time.perf_counter()
    h_coo = multigrid.build_hierarchy(M)
    print(f"amg setup (coo)          {time.perf_counter()-t0:9.3f} s", flush=True)

    def solve_body(y):
        s = multigrid.amg_pcg_solve(h_coo, u, x0=y, tol=1e-6)
        return s * 0.999
    chain_time(solve_body, jnp.zeros_like(u), max(args.iters // 10, 3),
               "amg-pcg solve (coo)")
    err = jnp.linalg.norm(coo_matvec(M, multigrid.amg_pcg_solve(h_coo, u, tol=1e-6)) - u) / jnp.linalg.norm(u)
    print(f"  rel residual: {float(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
