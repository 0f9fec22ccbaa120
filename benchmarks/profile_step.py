"""Per-component timing of the end-to-end optimization step on the TPU.

Bisects the bench.py workload (13 views @ 256², ~2.5k-vert source): each
stage is timed under jit in isolation.  Select stages with
``--stages raster,render,step`` to keep wall time bounded (each jit compile
on the tunneled TPU costs 20-60 s).
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
    return (time.perf_counter() - t0) / n * 1e3  # ms


def p(msg):
    print(msg, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="raster,aa,solve,render,step")
    ap.add_argument("--views", type=int, default=13)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render.raster import rasterize, interpolate
    from largesteps_tpu.render.pallas_raster import rasterize_pallas, rasterize_pallas_fwd
    from largesteps_tpu.render.antialias import antialias
    from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals
    from largesteps_tpu.core.geometry import compute_matrix
    from largesteps_tpu.core.parameterize import to_differential, get_solver
    from largesteps_tpu.core.solvers import solve as diff_solve
    from largesteps_tpu.core.optimize import adam_uniform

    p(f"backend: {jax.default_backend()}")
    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=args.views, res=args.res)
    renderer = Renderer(scene, shading=True, boost=3)
    res = renderer.res

    v_t = jnp.asarray(scene["mesh-target"]["vertices"])
    f_t = scene["mesh-target"]["faces"]
    fn_t = compute_face_normals(v_t, f_t)
    n_t = compute_vertex_normals(v_t, f_t, fn_t)
    topo_t = Topology(f_t)
    ref = jax.lax.stop_gradient(renderer.render(v_t, n_t, topo_t))

    v_s = jnp.asarray(scene["mesh-source"]["vertices"])
    f_s = scene["mesh-source"]["faces"]
    topo = Topology(f_s)
    faces = jnp.asarray(topo.faces)
    opp = jnp.asarray(topo.opp)
    M = compute_matrix(v_s, f_s, lambda_=19.0)
    u0 = to_differential(M, v_s)
    solver = get_solver(M, "Cholesky")
    p(f"V={v_s.shape[0]} F={faces.shape[0]} views={args.views} res={res}")

    v_ndc = jax.jit(lambda v: project(v, renderer.mvps))(v_s)
    raster_fwd = jax.jit(lambda vc: rasterize_pallas_fwd(vc, faces, res))
    rast = raster_fwd(v_ndc)

    if "raster" in stages:
        t = timeit(raster_fwd, v_ndc)
        p(f"raster fwd pallas:  {t:8.2f} ms")
        raster_fwdbwd = jax.jit(
            jax.grad(lambda vc: rasterize_pallas(vc, faces, res)[..., :2].sum()))
        t = timeit(raster_fwdbwd, v_ndc)
        p(f"raster fwd+bwd:     {t:8.2f} ms")

    if "aa" in stages:
        col = jnp.ones((*rast.shape[:-1], 4), jnp.float32)
        aa_bwd = jax.jit(jax.grad(
            lambda vc: antialias(col, rast, vc, faces, opp, 3.0).sum()))
        t = timeit(aa_bwd, v_ndc)
        p(f"antialias fwd+bwd:  {t:8.2f} ms")

    if "solve" in stages:
        solve_j = jax.jit(lambda u: diff_solve(solver, u))
        t = timeit(solve_j, u0)
        p(f"solve fwd:          {t:8.2f} ms")

    nrm = jax.jit(lambda v: compute_vertex_normals(
        v, f_s, compute_face_normals(v, f_s)))
    n_s = nrm(v_s)

    if "render" in stages:
        render_fwd = jax.jit(lambda v, n: renderer.render(v, n, topo))
        t = timeit(render_fwd, v_s, n_s)
        p(f"render fwd:         {t:8.2f} ms")
        render_loss = jax.jit(jax.grad(
            lambda v, n: jnp.square(renderer.render(v, n, topo) - ref).mean(),
            argnums=(0, 1)))
        t = timeit(render_loss, v_s, n_s)
        p(f"render fwd+bwd:     {t:8.2f} ms")

    if "step" in stages:
        tx = adam_uniform(0.03)

        def forward(theta):
            v = diff_solve(solver, theta["u"])
            fnl = compute_face_normals(v, f_s)
            n = compute_vertex_normals(v, f_s, fnl)
            imgs = renderer.render(theta["tr"] + v, n, topo)
            return jnp.square(imgs - ref).mean()

        @jax.jit
        def step(theta, opt_state):
            loss, grads = jax.value_and_grad(forward)(theta)
            updates, opt_state = tx.update(grads, opt_state, theta)
            theta = jax.tree.map(lambda a, b: a + b, theta, updates)
            return theta, opt_state, loss

        theta = {"u": u0, "tr": jnp.zeros((1, 3), jnp.float32)}
        opt_state = tx.init(theta)
        for _ in range(2):
            theta, opt_state, loss = step(theta, opt_state)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(10):
            theta, opt_state, loss = step(theta, opt_state)
        jax.block_until_ready(loss)
        t = (time.perf_counter() - t0) / 10 * 1e3
        p(f"FULL STEP:          {t:8.2f} ms   ({1000.0 / t:.1f} it/s)")


if __name__ == "__main__":
    main()
