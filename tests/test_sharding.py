"""Sharded-vs-single-device equivalence on the virtual 8-device CPU mesh
(SURVEY §4: 'shard_map/GSPMD equivalence to single-device outputs')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.core.geometry import compute_matrix
from largesteps_tpu.core.parameterize import to_differential
from largesteps_tpu.core.solvers import ConjugateGradientSolver, solve
from largesteps_tpu.core.optimize import adam_uniform
from largesteps_tpu.io.synth import make_scene
from largesteps_tpu.parallel import make_mesh, shard_renderer, build_sharded_step
from largesteps_tpu.render.renderer import Renderer, Topology
from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals


def build(n_views=8, res=32):
    scene = make_scene(source=("icosphere", 2), target=("gourd", 2),
                       n_views=n_views, res=res)
    renderer = Renderer(scene, shading=True, boost=3)
    v_t = jnp.asarray(scene["mesh-target"]["vertices"])
    f_t = scene["mesh-target"]["faces"]
    fn = compute_face_normals(v_t, f_t)
    n_t = compute_vertex_normals(v_t, f_t, fn)
    ref = renderer.render(v_t, n_t, Topology(f_t))
    v_s = jnp.asarray(scene["mesh-source"]["vertices"])
    f_s = scene["mesh-source"]["faces"]
    return scene, renderer, ref, v_s, f_s


def run_steps(mesh_args, n_steps=2):
    scene, renderer, ref, v_s, f_s = build()
    topo = Topology(f_s)
    M = compute_matrix(v_s, f_s, lambda_=9.0)
    u0 = to_differential(M, v_s)

    if mesh_args is not None:
        mesh = make_mesh(*mesh_args)
        renderer = shard_renderer(renderer, mesh, shard_rows=mesh_args[1] > 1)
    else:
        mesh = make_mesh(1, sp=1)

    cg = ConjugateGradientSolver(M, tol=1e-5)

    def solve_fn(u, gf, gb):
        return solve(cg, u, gf, gb)

    tx = adam_uniform(0.05)
    step, ref_p = build_sharded_step(
        mesh, renderer, topo, ref, tx, solve_fn=solve_fn,
        shard_rows=(mesh_args or (1, 1))[1] > 1,
        faces_unique=f_s, duplicate_idx=None,
    )
    theta = {"u": u0, "tr": jnp.zeros((1, 3), jnp.float32)}
    state = tx.init(theta)
    gf = jnp.zeros_like(v_s)
    gb = jnp.zeros_like(v_s)
    losses = []
    for _ in range(n_steps):
        theta, state, im_loss, vu, gu = step(theta, state, gf, gb)
        losses.append(float(im_loss))
    return losses, np.asarray(theta["u"])


@pytest.fixture(scope="module")
def single_device():
    return run_steps(None)


def test_dp_matches_single(single_device):
    losses0, u0 = single_device
    losses, u = run_steps((4, 1))
    np.testing.assert_allclose(losses, losses0, rtol=2e-4)
    np.testing.assert_allclose(u, u0, rtol=1e-3, atol=2e-5)


def test_dp_sp_matches_single(single_device):
    losses0, u0 = single_device
    losses, u = run_steps((8, 2))
    np.testing.assert_allclose(losses, losses0, rtol=2e-4)
    np.testing.assert_allclose(u, u0, rtol=1e-3, atol=2e-5)


def test_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def _driver_run(sharding, res_hw, steps=4, remesh=None):
    from largesteps_tpu.driver import optimize_shape
    h, w = res_hw
    scene = make_scene(source=("icosphere", 2), target=("gourd", 2),
                       n_views=8, res=32)
    scene["res_y"], scene["res_x"] = h, w
    params = {"steps": steps, "step_size": 0.05, "lambda": 9.0, "boost": 3,
              "solver": "CG", "sharding": sharding}
    if remesh is not None:
        params["remesh"] = remesh
    return optimize_shape(scene, params)


@pytest.mark.parametrize("res", [(32, 32), (32, 128)])
def test_driver_sharded_matches_single(res):
    """Directive: ONE driver code path composes sharding with the full
    step; sharded-vs-single allclose through BOTH render backends —
    (32, 32) auto-selects xla/GSPMD, (32, 128) auto-selects the fused
    pallas kernels running under shard_map on the 8-device CPU mesh."""
    single = _driver_run(None, res)
    shard = _driver_run({"dp": 4, "sp": 2}, res)
    np.testing.assert_allclose(shard["losses"][:, 0], single["losses"][:, 0],
                               rtol=2e-4, atol=2e-6)
    # per-step gradients agree to f32 rounding; cross-device psum ordering
    # drift compounds through 4 AdamUniform steps, hence the looser bar
    np.testing.assert_allclose(shard["v_final"], single["v_final"],
                               rtol=0, atol=1e-3)


def test_driver_sharded_remesh_event():
    """Sharding composes with a remesh event (topology epoch change) in
    the same driver path."""
    single = _driver_run(None, (32, 32), steps=4, remesh=[2])
    shard = _driver_run({"dp": 4, "sp": 2}, (32, 32), steps=4, remesh=[2])
    assert single["f"][1].shape == shard["f"][1].shape   # same remesh result
    np.testing.assert_allclose(shard["losses"][:, 0], single["losses"][:, 0],
                               rtol=5e-4, atol=5e-6)
