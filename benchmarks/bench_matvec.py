"""Compare sparse matvec formulations and solver tiers at large V on the
current backend (run on the TPU chip).

  coo   — gather + sorted segment_sum (scatter-add)
  ell   — padded-row gather-only form
  amg   — AMG-PCG solve (V-cycle preconditioner) with each matvec
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    from largesteps_tpu.core.sparse import coo_matvec, ell_matvec_fn
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

    u = coo_matvec(M, x)

    t0 = time.perf_counter()
    h_coo = multigrid.build_hierarchy(M)
    print(f"amg setup (coo)          {time.perf_counter()-t0:9.3f} s", flush=True)
    t0 = time.perf_counter()
    h_ell = multigrid.build_hierarchy(
        M, matvec_factory=lambda A: ell_matvec_fn(A))
    print(f"amg setup (ell)          {time.perf_counter()-t0:9.3f} s", flush=True)

    for name, h in (("coo", h_coo), ("ell", h_ell)):
        def solve_body(y, h=h):
            s = multigrid.amg_pcg_solve(h, u, x0=y, tol=1e-6)
            return s * 0.999
        chain_time(solve_body, jnp.zeros_like(u), max(args.iters // 10, 3),
                   f"amg-pcg solve ({name})")
        err = jnp.linalg.norm(coo_matvec(M, multigrid.amg_pcg_solve(h, u, tol=1e-6)) - u) / jnp.linalg.norm(u)
        print(f"  rel residual: {float(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
