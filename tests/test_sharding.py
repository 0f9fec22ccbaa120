"""Sharded-vs-single-device equivalence on the virtual 8-device CPU mesh
(SURVEY §4: 'shard_map/GSPMD equivalence to single-device outputs').

All equivalence tests drive the ONE production code path
(driver.optimize_shape with params['sharding']); round 3 retired the
separate build_sharded_step test-only step builder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.io.synth import make_scene


def test_dp_only_matches_single():
    """Pure viewpoint data-parallelism (no sp axis) through the driver."""
    single = _driver_run(None, (32, 32), steps=2)
    shard = _driver_run({"dp": 4}, (32, 32), steps=2)
    np.testing.assert_allclose(shard["losses"][:, 0], single["losses"][:, 0],
                               rtol=2e-4)
    np.testing.assert_allclose(shard["v_final"], single["v_final"],
                               rtol=1e-3, atol=2e-5)


def test_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def _driver_run(sharding, res_hw, steps=4, remesh=None, extra=None):
    from largesteps_tpu.driver import optimize_shape
    h, w = res_hw
    scene = make_scene(source=("icosphere", 2), target=("gourd", 2),
                       n_views=8, res=32)
    scene["res_y"], scene["res_x"] = h, w
    params = {"steps": steps, "step_size": 0.05, "lambda": 9.0, "boost": 3,
              "solver": "CG", "sharding": sharding}
    if extra:
        params.update(extra)
    if remesh is not None:
        params["remesh"] = remesh
    return optimize_shape(scene, params)


@pytest.mark.parametrize("res", [(32, 32), (32, 128), (64, 128)])
def test_driver_sharded_matches_single(res):
    """Directive: ONE driver code path composes sharding with the full
    step; sharded-vs-single allclose through BOTH render backends —
    (32, 32) auto-selects xla/GSPMD, (32, 128) the fused pallas kernels
    under shard_map with 'sp' sharding CAMERAS (1 tile row — the fallback
    layout), and (64, 128) the pallas kernels with 'sp' sharding image
    TILE ROWS within each camera (antialias halos ppermute across 'sp')."""
    single = _driver_run(None, res)
    shard = _driver_run({"dp": 4, "sp": 2}, res)
    # f32 drift: GSPMD reshards the per-camera projection matmul, whose
    # ulp-level differences shift antialias crossing parameters (verified
    # no boundary-row structure — max image diff sits mid-shard); the drift
    # compounds through 4 AdamUniform steps, hence the loose bars
    np.testing.assert_allclose(shard["losses"][:, 0], single["losses"][:, 0],
                               rtol=1e-3, atol=2e-6)
    np.testing.assert_allclose(shard["v_final"], single["v_final"],
                               rtol=0, atol=2e-3)


def test_driver_sharded_big_pipeline():
    """Sharded-vs-single allclose through the LARGE-F host-binned pipeline
    (the ≥100k-face configuration): host_bin_faces=1 forces host bins and
    host_bin_cap>1024 engages the camera-sequential big pipe, run under a
    (dp=4, sp=2) mesh so 'sp' shards image TILE ROWS within each camera —
    the row sharding round 4 dropped at exactly this scale."""
    big = {"host_bin_faces": 1, "host_bin_cap": 1152, "rebin_every": 0,
           "rebin_auto": False}
    single = _driver_run(None, (64, 128), steps=3, extra=big)
    shard = _driver_run({"dp": 4, "sp": 2}, (64, 128), steps=3, extra=big)
    np.testing.assert_allclose(shard["losses"][:, 0], single["losses"][:, 0],
                               rtol=1e-3, atol=2e-6)
    np.testing.assert_allclose(shard["v_final"], single["v_final"],
                               rtol=0, atol=2e-3)


def test_driver_sharded_remesh_event():
    """Sharding composes with a remesh event (topology epoch change) in
    the same driver path."""
    single = _driver_run(None, (32, 32), steps=4, remesh=[2])
    shard = _driver_run({"dp": 4, "sp": 2}, (32, 32), steps=4, remesh=[2])
    assert single["f"][1].shape == shard["f"][1].shape   # same remesh result
    np.testing.assert_allclose(shard["losses"][:, 0], single["losses"][:, 0],
                               rtol=5e-4, atol=5e-6)
