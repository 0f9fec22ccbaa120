"""End-to-end benchmark: optimization iterations/second on one TPU chip.

Metric mirrors the reference's equal-time protocol (BASELINE.md): full
pipeline throughput — differentiable solve (Cholesky) + shaded multi-view
render fwd/bwd + AdamUniform step — on a suzanne-class problem.  The
reference's implied numbers on a TITAN RTX are 30.3–36.0 it/s across the six
comparison scenes (mean ≈ 31.6 it/s, BASELINE.md table); since the original
scene assets are a separate download, the workload here is a synthesized
scene of matching scale: ~2.5k-vertex source sphere, organic target, 13
viewpoints at 256×256, shading + antialiasing, λ=19.

Prints ONE JSON line:  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import time

REFERENCE_ITERS_PER_S = 31.6  # BASELINE.md: mean of the 6 comparison scenes


def main():
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

    # warmup / compile
    for _ in range(3):
        theta, opt_state, loss, guess_bwd = step(theta, opt_state, guess_bwd)
    jax.block_until_ready(loss)

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        theta, opt_state, loss, guess_bwd = step(theta, opt_state, guess_bwd)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    iters_per_s = n_iters / dt
    print(json.dumps({
        "metric": "opt_iters_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / REFERENCE_ITERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
