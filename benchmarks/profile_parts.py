"""Fine-grained component timing of the bench.py workload (13×256², ~2.5k V).

Leaner than profile_step.py: no reference-image render, every timed piece is
its own tiny jit so compiles stay bounded.  Select with --parts.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="rfwd,rbwd,interp,aafwd,aabwd,solve,normals")
    ap.add_argument("--views", type=int, default=13)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()
    parts = set(args.parts.split(","))

    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render.raster import interpolate
    import largesteps_tpu.render.raster as R
    from largesteps_tpu.render.pallas_raster import rasterize_pallas_fwd
    from largesteps_tpu.render.antialias import antialias
    from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals
    from largesteps_tpu.core.geometry import compute_matrix
    from largesteps_tpu.core.parameterize import to_differential, get_solver
    from largesteps_tpu.core.solvers import solve as diff_solve

    print(f"backend: {jax.default_backend()}", flush=True)
    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=args.views, res=args.res)
    renderer = Renderer(scene, shading=True, boost=3)
    res = renderer.res
    v_s = jnp.asarray(scene["mesh-source"]["vertices"])
    f_s = scene["mesh-source"]["faces"]
    topo = Topology(f_s)
    faces = jnp.asarray(topo.faces)
    opp = jnp.asarray(topo.opp)
    print(f"V={v_s.shape[0]} F={faces.shape[0]} views={args.views} res={res}", flush=True)

    v_ndc = jax.jit(lambda v: project(v, renderer.mvps))(v_s)
    raster_fwd = jax.jit(lambda vc: rasterize_pallas_fwd(vc, faces, res))
    rast = raster_fwd(v_ndc)
    jax.block_until_ready(rast)

    if "rfwd" in parts:
        print(f"raster fwd (pallas): {timeit(raster_fwd, v_ndc):8.2f} ms", flush=True)

    if "rbwd" in parts:
        g = jnp.ones((*rast.shape[:-1], 4), jnp.float32) * 1e-3
        bwd = jax.jit(lambda vc, rst, gg: R._rasterize_vjp_bwd(
            res, None, (vc, faces, rst), gg)[0])
        print(f"raster bwd (XLA):    {timeit(bwd, v_ndc, rast, g):8.2f} ms", flush=True)

    if "interp" in parts:
        attr = jnp.ones((v_s.shape[0], 3), jnp.float32)
        f_interp = jax.jit(lambda a, r: interpolate(a, r, faces))
        print(f"interp fwd:          {timeit(f_interp, attr, rast):8.2f} ms", flush=True)
        f_interp_g = jax.jit(jax.grad(lambda a, r: interpolate(a, r, faces).sum(),
                                      argnums=(0, 1)))
        print(f"interp fwd+bwd:      {timeit(f_interp_g, attr, rast):8.2f} ms", flush=True)

    col = jnp.ones((*rast.shape[:-1], 4), jnp.float32)
    if "aafwd" in parts:
        f_aa = jax.jit(lambda c, r, vc: antialias(c, r, vc, faces, opp, 3.0))
        print(f"aa fwd:              {timeit(f_aa, col, rast, v_ndc):8.2f} ms", flush=True)
    if "aabwd" in parts:
        f_aag = jax.jit(jax.grad(
            lambda c, r, vc: antialias(c, r, vc, faces, opp, 3.0).sum(),
            argnums=(0, 2)))
        print(f"aa fwd+bwd:          {timeit(f_aag, col, rast, v_ndc):8.2f} ms", flush=True)

    if "solve" in parts:
        M = compute_matrix(v_s, f_s, lambda_=19.0)
        u0 = to_differential(M, v_s)
        solver = get_solver(M, "Cholesky")
        f_solve = jax.jit(lambda u: diff_solve(solver, u))
        print(f"solve fwd:           {timeit(f_solve, u0):8.2f} ms", flush=True)

    if "normals" in parts:
        f_n = jax.jit(lambda v: compute_vertex_normals(
            v, f_s, compute_face_normals(v, f_s)))
        print(f"normals fwd:         {timeit(f_n, v_s):8.2f} ms", flush=True)

    if "project" in parts:
        f_p = jax.jit(lambda v: project(v, renderer.mvps))
        print(f"project fwd:         {timeit(f_p, v_s):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
