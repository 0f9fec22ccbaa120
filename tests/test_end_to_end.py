"""Integration: Tutorial-equivalent optimization (BASELINE.json configs[1])
plus driver features (remesh schedule, baselines, checkpointing, IO)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from largesteps_tpu.driver import optimize_shape
from largesteps_tpu.io.synth import make_scene, save_scene
from largesteps_tpu.io.xml_scene import load_scene
from largesteps_tpu.metrics import symmetric_hausdorff


def small_scene(**kw):
    defaults = dict(source=("icosphere", 2), target=("gourd", 2),
                    n_views=4, res=48)
    defaults.update(kw)
    return make_scene(**defaults)


@pytest.fixture(scope="module")
def tutorial_result():
    scene = small_scene()
    params = {"steps": 40, "step_size": 0.05, "lambda": 19.0,
              "boost": 3, "shading": True, "loss": "l1"}
    return scene, optimize_shape(scene, params)


def test_loss_decreases(tutorial_result):
    scene, res = tutorial_result
    losses = res["losses"][:, 0]
    assert losses[-5:].mean() < 0.6 * losses[:3].mean(), losses


def test_hausdorff_improves(tutorial_result):
    scene, res = tutorial_result
    v_t = scene["mesh-target"]["vertices"]
    f_t = scene["mesh-target"]["faces"]
    v_s = scene["mesh-source"]["vertices"]
    f_s = scene["mesh-source"]["faces"]
    d0 = symmetric_hausdorff(v_s, f_s, v_t, f_t)
    d1 = symmetric_hausdorff(res["v_final"], res["f_final"], v_t, f_t)
    assert d1 < d0, (d1, d0)


def test_silhouette_mode_runs():
    scene = small_scene(n_views=2, res=32)
    res = optimize_shape(scene, {"steps": 6, "shading": False,
                                 "step_size": 0.05, "lambda": 9.0})
    assert np.isfinite(res["losses"]).all()


def test_non_smooth_baseline_with_reg():
    scene = small_scene(n_views=2, res=32)
    res = optimize_shape(scene, {
        "steps": 6, "smooth": False, "reg": 0.1, "bilaplacian": True,
        "optimizer": "Adam", "step_size": 0.001,
    })
    assert np.isfinite(res["losses"]).all()


def test_cg_solver_path():
    scene = small_scene(n_views=2, res=32)
    res = optimize_shape(scene, {"steps": 6, "solver": "CG",
                                 "step_size": 0.05, "lambda": 9.0})
    assert np.isfinite(res["losses"]).all()


def test_remesh_schedule():
    scene = small_scene(n_views=2, res=32)
    res = optimize_shape(scene, {"steps": 10, "remesh": [4],
                                 "step_size": 0.05, "lambda": 9.0})
    assert len(res["f"]) == 2       # initial + post-remesh topology
    assert np.isfinite(res["losses"]).all()
    assert res["f"][1].shape[0] != res["f"][0].shape[0]


def test_scene_xml_roundtrip(tmp_path):
    scene = small_scene(n_views=3, res=32)
    path = save_scene(scene, str(tmp_path), "roundtrip")
    loaded = load_scene(path)
    assert loaded["res_x"] == scene["res_x"]
    assert len(loaded["view_mats"]) == 3
    np.testing.assert_allclose(
        loaded["mesh-source"]["vertices"], scene["mesh-source"]["vertices"],
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        loaded["mesh-source"]["faces"], scene["mesh-source"]["faces"])
    for got, want in zip(loaded["view_mats"], scene["view_mats"]):
        np.testing.assert_allclose(got, want, atol=2e-5)
    # envmap round-trips through the RGBE codec; quantization error is
    # bounded by (per-pixel max channel) / 256 (shared 8-bit mantissa)
    env0 = scene["envmap"][..., :3]
    env1 = loaded["envmap"][..., :3]
    bound = env0.max(axis=-1, keepdims=True) / 256 + 1e-6
    assert (np.abs(env1 - env0) <= bound).all()


def test_checkpoint_roundtrip(tmp_path):
    from largesteps_tpu.driver.checkpoint import save_checkpoint, load_checkpoint
    from largesteps_tpu.core.optimize import adam_uniform

    tx = adam_uniform(0.01)
    theta = {"u": jnp.ones((5, 3)), "tr": jnp.zeros((1, 3))}
    state = tx.init(theta)
    upd, state = tx.update({"u": jnp.ones((5, 3)), "tr": jnp.ones((1, 3))}, state)
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, theta=theta, opt_state=state,
                    v_src=np.zeros((5, 3)), f_src=np.zeros((4, 3), np.int32),
                    step=7, step_size=0.01, remesh_schedule=[10, 20])
    out = load_checkpoint(path, theta_like=theta, opt_state_like=state)
    assert out["meta"]["step"] == 7
    assert out["meta"]["remesh_schedule"] == [10, 20]
    np.testing.assert_allclose(out["theta"]["u"], theta["u"])
    chex_leaves = jnp.asarray(out["opt_state"].count)
    assert int(chex_leaves) == int(state.count)


def test_resume_matches_unbroken_run(tmp_path):
    """End-to-end resume equivalence (round-4 verdict item, carried since
    round 1): N steps + checkpoint + resume N more — including a remesh
    event scheduled exactly at the checkpoint step — must reproduce the
    unbroken 2N-step run's loss trajectory and final vertices."""
    scene = small_scene()
    base = {"steps": 6, "step_size": 0.05, "lambda": 19.0, "boost": 3,
            "solver": "Cholesky", "remesh": [3]}
    full = optimize_shape(scene, dict(base))

    ck = os.path.join(tmp_path, "ck.npz")
    first = optimize_shape(scene, {**base, "steps": 3,
                                   "checkpoint_every": 1,
                                   "checkpoint_path": ck})
    assert os.path.exists(ck)
    second = optimize_shape(scene, {**base, "resume": ck})

    np.testing.assert_allclose(first["losses"][:, 0], full["losses"][:3, 0],
                               rtol=1e-5)
    np.testing.assert_allclose(second["losses"][:, 0], full["losses"][3:, 0],
                               rtol=1e-4, atol=1e-7)
    assert second["f_final"].shape == full["f_final"].shape  # remesh replayed
    np.testing.assert_allclose(second["v_final"], full["v_final"],
                               rtol=1e-4, atol=1e-6)
