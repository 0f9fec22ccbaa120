"""Device-side binning (pallas_core.bin_triangles_device) parity vs the
host binning, and closed-mesh backface-cull image parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.io.synth import make_scene
from largesteps_tpu.render.renderer import Renderer, Topology
from largesteps_tpu.render.camera import project
from largesteps_tpu.render import pallas_core as pc
from largesteps_tpu.render.sh import sh_eval
from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals


@pytest.fixture(scope="module")
def scene():
    s = make_scene(source=("icosphere", 3), target=("gourd", 3),
                   n_views=2, res=128)
    s["res_y"], s["res_x"] = 64, 128
    r = Renderer(s, shading=True, boost=3)
    v = jnp.asarray(s["mesh-source"]["vertices"])
    f = s["mesh-source"]["faces"]
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(r.sh_M, n) / np.pi
    v_ndc = project(v, r.mvps)
    return r, topo, v_ndc, attrs


def _bin_sets(bins):
    """Per-(cam, tile) sorted sets of binned face ids."""
    C, T, cap = bins.shape
    out = []
    for c in range(C):
        for t in range(T):
            ids = bins[c, t]
            out.append(np.sort(ids[ids >= 0]))
    return out


def test_device_bins_match_host(scene):
    r, topo, v_ndc, attrs = scene
    for margin in (0.0, 4.0):
        hb, hc, hocc = pc.bin_triangles_host(
            np.asarray(v_ndc), topo.faces, r.res, cap=1280, margin=margin)
        db, dc, dfs, docc = jax.jit(
            lambda vn: pc.bin_triangles_device(
                vn, topo.faces, r.res, 1280, margin=margin)
        )(v_ndc)
        db, dc, dfs = np.asarray(db), np.asarray(dc), np.asarray(dfs)
        assert int(docc) == hocc
        np.testing.assert_array_equal(dc, hc)
        for a, b in zip(_bin_sets(db), _bin_sets(hb)):
            np.testing.assert_array_equal(a, b)
        # face_slots is the exact inverse of bins: every live (tile, pos)
        # slot appears exactly once among its face's K candidate slots
        C, T, cap = db.shape
        for c in range(C):
            flat = db[c].reshape(-1)
            live = np.flatnonzero(flat >= 0)
            inv = np.full(T * cap, -1, np.int64)
            fs = dfs[c]
            rows = np.repeat(np.arange(fs.shape[0]), fs.shape[1])
            vals = fs.reshape(-1)
            sel = vals < T * cap
            inv[vals[sel]] = rows[sel]
            np.testing.assert_array_equal(inv[live], flat[live])
            assert (inv[np.setdiff1d(np.arange(T * cap), live)] == -1).all()


def test_device_bins_render_parity(scene):
    """Images rendered from device bins == from host bins."""
    r, topo, v_ndc, attrs = scene
    cap = 1280
    pipe = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                   shading=True, boost=3.0, cap=cap,
                                   prebinned=True)
    hb, hc, _ = pc.bin_triangles_host(np.asarray(v_ndc), topo.faces, r.res,
                                      cap=cap, margin=2.0)
    db, dc, _, _ = pc.bin_triangles_device(v_ndc, topo.faces, r.res, cap,
                                           margin=2.0)
    out_h = pipe(v_ndc, attrs, r.bgs, jnp.asarray(hb), jnp.asarray(hc))
    out_d = pipe(v_ndc, attrs, r.bgs, db, dc)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_h),
                               rtol=0, atol=1e-6)


def test_backface_cull_image_parity(scene):
    """On a closed mesh, culling back-facing triangles from the bins must
    not change the image (backfaces never win the z-test) while roughly
    halving occupancy."""
    r, topo, v_ndc, attrs = scene
    cap = 1280
    pipe = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                   shading=True, boost=3.0, cap=cap,
                                   prebinned=True)
    b0, c0, _, occ0 = pc.bin_triangles_device(v_ndc, topo.faces, r.res, cap,
                                              margin=2.0, cull=False)
    b1, c1, _, occ1 = pc.bin_triangles_device(v_ndc, topo.faces, r.res, cap,
                                              margin=2.0, cull=True)
    assert int(occ1) < int(occ0) * 0.7
    out0 = np.asarray(pipe(v_ndc, attrs, r.bgs, b0, c0))
    out1 = np.asarray(pipe(v_ndc, attrs, r.bgs, b1, c1))
    np.testing.assert_allclose(out1, out0, rtol=0, atol=1e-5)


def test_driver_auto_rebin_matches_traced():
    """Driver with device rebinning + displacement-triggered cadence must
    reproduce the traced-binning run."""
    from largesteps_tpu.driver import optimize_shape
    scene = make_scene(source=("icosphere", 2), target=("gourd", 2),
                       n_views=4, res=128)
    scene["res_y"], scene["res_x"] = 32, 128
    base = {"steps": 6, "step_size": 0.05, "lambda": 9.0, "boost": 3,
            "solver": "CG"}
    r0 = optimize_shape(scene, base)
    r1 = optimize_shape(scene, {**base, "host_bin_faces": 1,
                                "rebin_every": 3, "rebin_auto": True,
                                "rebin_margin": 4.0})
    assert r1["prof"]["rebin_n"] >= 1
    np.testing.assert_allclose(r1["losses"][:, 0], r0["losses"][:, 0],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(r1["v_final"], r0["v_final"],
                               rtol=1e-3, atol=1e-5)
