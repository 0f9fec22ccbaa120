"""End-to-end and component benchmarks on one TPU chip.

Headline metric (printed LAST): optimization iterations/second on the
reference's equal-time protocol workload (BASELINE.md) — full pipeline
throughput: differentiable solve (Cholesky) + shaded 13-view 256x256 render
fwd/bwd with antialiasing + AdamUniform step, suzanne-class mesh (~2.5k
verts).  The reference implies 30.3-36.0 it/s on a TITAN RTX (mean ~31.6).

Also prints one JSON line per BASELINE.json component metric:
  * from_differential solve ms (Cholesky 2.5k / 40k verts, CG 160k verts)
  * rasterize forward and forward+backward Mpix/s (fused Pallas pipeline)

Timing note: the axon TPU client completes dispatch asynchronously and
``block_until_ready`` can return before execution finishes, so every
measurement here chains iterations through data dependencies and fetches a
scalar result to host, which is the only reliable completion barrier.
"""
import json
import time

REFERENCE_ITERS_PER_S = 31.6  # BASELINE.md: mean of the 6 comparison scenes


def fetch(x):
    """Host-fetch a scalar from a jax array — the completion barrier."""
    import numpy as np
    import jax
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def bench_solve():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from largesteps_tpu.ops.shapes import icosphere
    from largesteps_tpu.core.geometry import compute_matrix
    from largesteps_tpu.core.parameterize import to_differential, get_solver
    from largesteps_tpu.core.solvers import solve as diff_solve, cg_solve

    out = []
    # "Cholesky" is the driver's default solver at EVERY size — the 163,842v
    # row exercises exactly what a driver step at nefertiti scale runs
    # (block-tridiagonal LDL^T tier, core/banded.py)
    for subdiv, method in ((4, "Cholesky"), (6, "Cholesky"), (7, "Cholesky"),
                           (7, "CG")):
        v, f = icosphere(subdiv)
        n = v.shape[0]
        M = compute_matrix(v, f, lambda_=19.0)
        solver = get_solver(M, method)
        u = to_differential(M, jnp.asarray(v))
        iters = 50 if n < 100_000 else 10

        @jax.jit
        def chain(slv, u0):
            def body(i, x):
                return diff_solve(slv, x * 0.999 + u * 0.001)
            return jax.lax.fori_loop(0, iters, body, u0)

        fetch(chain(solver, u))        # compile
        t0 = time.perf_counter()
        fetch(chain(solver, u))
        ms = (time.perf_counter() - t0) / iters * 1e3
        # label by the tier that actually executed, not the one requested
        ran = getattr(solver, "tier", method.lower())
        out.append({"metric": f"from_differential_ms_{ran}_{n}v",
                    "value": round(ms, 3), "unit": "ms", "vs_baseline": None})
    return out


def bench_raster(n_views=13, res=256):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals

    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=n_views, res=res)
    renderer = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    renderer.check_overflow(v, topo)    # size bins like the driver does
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    mpix = n_views * res * res / 1e6
    iters = 20

    @jax.jit
    def chain_fwd(v0):
        def body(i, v_):
            img = renderer.render(v_, n, topo)
            return v_ + 1e-12 * img.mean()
        return jax.lax.fori_loop(0, iters, body, v0)

    fetch(chain_fwd(v))
    t0 = time.perf_counter()
    fetch(chain_fwd(v))
    fwd_ms = (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def chain_fwdbwd(v0):
        def body(i, v_):
            g = jax.grad(lambda x: renderer.render(x, n, topo).mean())(v_)
            return v_ + 1e-12 * g
        return jax.lax.fori_loop(0, iters, body, v0)

    fetch(chain_fwdbwd(v))
    t0 = time.perf_counter()
    fetch(chain_fwdbwd(v))
    fb_ms = (time.perf_counter() - t0) / iters * 1e3
    return [
        {"metric": "raster_fwd_mpix_per_s", "value": round(mpix / fwd_ms * 1e3, 1),
         "unit": "Mpix/s", "vs_baseline": None},
        {"metric": "raster_fwdbwd_mpix_per_s", "value": round(mpix / fb_ms * 1e3, 1),
         "unit": "Mpix/s", "vs_baseline": None},
    ]


def bench_step():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals
    from largesteps_tpu.core.geometry import compute_matrix
    from largesteps_tpu.core.parameterize import to_differential, get_solver
    from largesteps_tpu.core.solvers import solve as diff_solve
    from largesteps_tpu.core.optimize import adam_uniform

    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=13, res=256)
    renderer = Renderer(scene, shading=True, boost=3)

    v_t = jnp.asarray(scene["mesh-target"]["vertices"])
    f_t = scene["mesh-target"]["faces"]
    fn_t = compute_face_normals(v_t, f_t)
    n_t = compute_vertex_normals(v_t, f_t, fn_t)
    ref = jax.lax.stop_gradient(renderer.render(v_t, n_t, Topology(f_t)))

    v_s = jnp.asarray(scene["mesh-source"]["vertices"])
    f_s = scene["mesh-source"]["faces"]
    topo = Topology(f_s)
    renderer.check_overflow(v_s, topo)  # size bins like the driver does
    M = compute_matrix(v_s, f_s, lambda_=19.0)
    u0 = to_differential(M, v_s)
    solver = get_solver(M, "Cholesky")
    tx = adam_uniform(0.03)

    def forward(theta, guess_bwd):
        v = diff_solve(solver, theta["u"], None, guess_bwd)
        fn = compute_face_normals(v, f_s)
        n = compute_vertex_normals(v, f_s, fn)
        imgs = renderer.render(theta["tr"] + v, n, topo)
        return jnp.square(imgs - ref).mean()

    @jax.jit
    def step(theta, opt_state, guess_bwd):
        loss, grads = jax.value_and_grad(forward)(theta, guess_bwd)
        updates, opt_state = tx.update(grads, opt_state, theta)
        theta = jax.tree.map(lambda a, b: a + b, theta, updates)
        return theta, opt_state, loss, grads["u"]

    theta = {"u": u0, "tr": jnp.zeros((1, 3), jnp.float32)}
    opt_state = tx.init(theta)
    guess_bwd = jnp.zeros_like(v_s)

    for _ in range(3):    # warmup / compile
        theta, opt_state, loss, guess_bwd = step(theta, opt_state, guess_bwd)
    fetch(loss)

    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        theta, opt_state, loss, guess_bwd = step(theta, opt_state, guess_bwd)
    fetch(loss)           # data-dependent chain: forces all steps to finish
    dt = time.perf_counter() - t0
    iters_per_s = n_iters / dt
    return {"metric": "opt_iters_per_s", "value": round(iters_per_s, 3),
            "unit": "iter/s",
            "vs_baseline": round(iters_per_s / REFERENCE_ITERS_PER_S, 3)}


def bench_ablate(n_views=13, res=256):
    """Backward-stage cost attribution at suzanne-class (the render budget
    tracked round-over-round): each line is the fwd+bwd time with one
    backward stage zeroed; the delta vs 'none' is that stage's in-pipe
    cost."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render import pallas_core as pc
    from largesteps_tpu.render.sh import sh_eval
    from largesteps_tpu.ops.normals import (compute_face_normals,
                                            compute_vertex_normals)

    scene = make_scene(source=("icosphere", 4), target=("gourd", 4),
                       n_views=n_views, res=res)
    renderer = Renderer(scene, shading=True, boost=3)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = scene["mesh-source"]["faces"]
    topo = Topology(f)
    renderer.check_overflow(v, topo)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(renderer.sh_M, n) / np.pi
    v_ndc = project(v, renderer.mvps)
    iters = 20
    out = []
    for ablate in ("", "aabwd", "rbwd", "scatter"):
        pipe = pc.make_render_pipeline(topo.faces, topo.opp, renderer.res,
                                       shading=True, boost=3.0,
                                       cap=renderer.bin_cap, ablate=ablate)

        @jax.jit
        def fb(vc):
            def body(i, v_):
                g = jax.grad(lambda x: pipe(x, attrs, renderer.bgs).mean())(v_)
                return v_ + 1e-12 * g
            return jax.lax.fori_loop(0, iters, body, vc)

        fetch(fb(v_ndc))
        t0 = time.perf_counter()
        fetch(fb(v_ndc))
        ms = (time.perf_counter() - t0) / iters * 1e3
        out.append({"metric": f"render_fwdbwd_ms_ablate_{ablate or 'none'}",
                    "value": round(ms, 3), "unit": "ms", "vs_baseline": None})
    return out


def bench_step_nefertiti(steps=40):
    """End-to-end driver throughput at the north-star scale: 163,842 verts
    (327,680 faces), 13 views, 256², default Cholesky (banded) solver,
    host-binned render path with the DRIVER-DEFAULT rebin policy (the
    round-4 number measured with rebinning disabled and was 12× the real
    rate — this one runs the production config).  ``cull_backfaces`` stays off —
    matching the production teaser config (culling measured a 14% loss gap
    once triangles flip mid-optimization).

    Reported:
      * .._sustained — (iters-1)/(wall − first-step): everything a long run
        pays per step (device step, rebins, dispatch, drain) with only the
        one-time trace/compile excluded (it amortizes over the 2170-step
        production runs; reported separately).
      * nefertiti_first_step_s — trace+compile(+1 exec) of the big pipeline.
      * nefertiti_rebin_ms — mean cost per rebin event.
    """
    import numpy as np
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.driver import optimize_shape

    scene = make_scene(source=("icosphere", 7), target=("gourd", 4),
                       n_views=13, res=256)
    p = {"steps": steps, "step_size": 0.05, "lambda": 19.0, "boost": 3,
         "solver": "Cholesky"}
    r = optimize_shape(scene, p)
    prof = r["prof"]
    post = max(r["wall_time"] - prof["first_step_s"], 1e-9)
    sustained = (r["iters"] - 1) / post
    return [
        {"metric": "opt_iters_per_s_163842v_sustained",
         "value": round(sustained, 3), "unit": "iter/s", "vs_baseline": None},
        {"metric": "nefertiti_first_step_s",
         "value": round(prof["first_step_s"], 2), "unit": "s",
         "vs_baseline": None},
        {"metric": "nefertiti_rebin_ms",
         "value": round(prof["rebin_s"] / max(prof["rebin_n"], 1) * 1e3, 1),
         "unit": "ms", "vs_baseline": None},
        {"metric": "nefertiti_rebin_n", "value": prof["rebin_n"],
         "unit": "count", "vs_baseline": None},
    ]


def bench_sharded_cg():
    """Edge-sharded CG (parallel/tri_shard.py) at 163,842 verts on the
    8-device VIRTUAL CPU mesh vs single-device CPU — run in a subprocess so
    the TPU process keeps its backend.  NOTE the honest caveat in the
    label: this host has 2 physical cores, so 8 virtual devices time-slice
    and the wall-clock does NOT reflect an 8-chip ICI mesh; the line tracks
    correctness + per-device work (nnz/8) round-over-round, and the
    multichip dryrun validates the same code path SPMD."""
    import subprocess
    import sys
    code = r'''
import os, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from largesteps_tpu.ops.shapes import icosphere
from largesteps_tpu.core.geometry import compute_matrix
from largesteps_tpu.core.parameterize import to_differential
from largesteps_tpu.core.solvers import cg_solve
from largesteps_tpu.parallel.sharding import make_mesh
from largesteps_tpu.parallel.tri_shard import sharded_cg_solve
v, f = icosphere(7)
M = compute_matrix(v, f, lambda_=19.0)
u = to_differential(M, jnp.asarray(v))
def timeit(fn):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return (time.perf_counter() - t0) * 1e3
t1 = timeit(lambda: cg_solve(M, u, tol=1e-5))
mesh = make_mesh(8, sp=2)
t8 = timeit(lambda: sharded_cg_solve(M, u, mesh, tol=1e-5))
print(json.dumps({"cpu1_ms": round(t1, 1), "cpu8_ms": round(t8, 1)}))
'''
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200,
                         cwd=__import__("os").path.dirname(
                             __import__("os").path.abspath(__file__)))
    data = json.loads(out.stdout.strip().splitlines()[-1])
    return [
        {"metric": "sharded_cg_163842v_cpu8virt_ms", "value": data["cpu8_ms"],
         "unit": "ms", "vs_baseline": None},
        {"metric": "cg_163842v_cpu1_ms", "value": data["cpu1_ms"],
         "unit": "ms", "vs_baseline": None},
    ]


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.jax_cache")
    except Exception:
        pass
    for line in bench_solve():
        print(json.dumps(line), flush=True)
    for line in bench_raster():
        print(json.dumps(line), flush=True)
    for line in bench_ablate():
        print(json.dumps(line), flush=True)
    try:
        for line in bench_step_nefertiti():
            print(json.dumps(line), flush=True)
    except Exception as e:   # must never cost the headline metric
        print(json.dumps({"metric": "opt_iters_per_s_163842v_sustained",
                          "value": None, "unit": "iter/s",
                          "vs_baseline": None,
                          "error": str(e)[:200]}), flush=True)
    try:
        for line in bench_sharded_cg():
            print(json.dumps(line), flush=True)
    except Exception as e:
        print(json.dumps({"metric": "sharded_cg_163842v_cpu8virt_ms",
                          "value": None, "unit": "ms", "vs_baseline": None,
                          "error": str(e)[:200]}), flush=True)
    print(json.dumps(bench_step()), flush=True)


if __name__ == "__main__":
    main()
