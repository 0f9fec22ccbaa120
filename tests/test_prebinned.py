"""Host-binned (large-F) pipeline parity vs the traced-binning pipeline.

The ≥100k-face regime replaces the traced per-step binning (O(T·F log F),
measured 22 s/step at 327k faces on chip) with host bins recomputed every
few steps (pallas_core.bin_triangles_host) threaded into the jitted step as
device arguments.  Outputs must match the self-binning pipeline bit-for-bit
up to summation order; the fori-loop one-hot kernels (cap > 1024) must
match the unrolled ones.
"""
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
    assert r.backend == "pallas"
    v = jnp.asarray(s["mesh-source"]["vertices"])
    f = s["mesh-source"]["faces"]
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(r.sh_M, n) / np.pi
    v_ndc = project(v, r.mvps)
    return r, topo, v_ndc, attrs


def _run(pipe, v_ndc, attrs, bg, extra=()):
    out = pipe(v_ndc, attrs, bg, *extra)
    g = jax.grad(lambda vc: pipe(vc, attrs, bg, *extra).sum())(v_ndc)
    ga = jax.grad(lambda a: pipe(v_ndc, a, bg, *extra).sum())(attrs)
    return out, g, ga


def test_prebinned_matches_traced(scene):
    r, topo, v_ndc, attrs = scene
    cap = 640
    pipe = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                   shading=True, boost=3.0, cap=cap)
    bins, counts, occ = pc.bin_triangles_host(
        np.asarray(v_ndc), topo.faces, r.res, cap=cap, margin=0.0)
    assert occ <= cap
    pipe_pb = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                      shading=True, boost=3.0, cap=cap,
                                      prebinned=True)
    out0, g0, ga0 = _run(pipe, v_ndc, attrs, r.bgs)
    out1, g1, ga1 = _run(pipe_pb, v_ndc, attrs, r.bgs,
                         (jnp.asarray(bins), jnp.asarray(counts)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0),
                               rtol=1e-4, atol=1e-5)


def test_host_bins_margin_stable(scene):
    """A margin-expanded binning must produce the same image (extra faces in
    bins are culled by the coverage test)."""
    r, topo, v_ndc, attrs = scene
    # size the cap from the margin-expanded binning so nothing truncates
    _, _, occ4 = pc.bin_triangles_host(np.asarray(v_ndc), topo.faces, r.res,
                                       margin=4.0)
    cap = pc.suggest_cap(occ4)
    pipe_pb = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                      shading=True, boost=3.0, cap=cap,
                                      prebinned=True)
    outs = []
    for margin in (0.0, 4.0):
        bins, counts, occ = pc.bin_triangles_host(
            np.asarray(v_ndc), topo.faces, r.res, cap=cap, margin=margin)
        assert occ <= cap
        outs.append(np.asarray(pipe_pb(v_ndc, attrs, r.bgs,
                                       jnp.asarray(bins),
                                       jnp.asarray(counts))))
    np.testing.assert_allclose(outs[1], outs[0], rtol=0, atol=1e-5)


def test_bigcap_fori_matches_unrolled(scene):
    """cap > 1024 routes the kernels through the fori-loop one-hot helpers
    (the large-mesh code path) — outputs must match the unrolled path."""
    r, topo, v_ndc, attrs = scene
    pipe_small = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                         shading=True, boost=3.0, cap=640)
    pipe_big = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                       shading=True, boost=3.0, cap=1280,
                                       prebinned=True)
    bins, counts, _ = pc.bin_triangles_host(
        np.asarray(v_ndc), topo.faces, r.res, cap=1280, margin=0.0)
    out0, g0, ga0 = _run(pipe_small, v_ndc, attrs, r.bgs)
    out1, g1, ga1 = _run(pipe_big, v_ndc, attrs, r.bgs,
                         (jnp.asarray(bins), jnp.asarray(counts)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0),
                               rtol=1e-4, atol=1e-5)


def test_driver_host_bins_matches_traced():
    """The driver's host-binning path (forced via host_bin_faces=1) must
    reproduce the traced-binning run, including a mid-run re-bin."""
    from largesteps_tpu.driver import optimize_shape
    scene = make_scene(source=("icosphere", 2), target=("gourd", 2),
                       n_views=4, res=128)
    scene["res_y"], scene["res_x"] = 32, 128
    base = {"steps": 5, "step_size": 0.05, "lambda": 9.0, "boost": 3,
            "solver": "CG"}
    r0 = optimize_shape(scene, base)
    r1 = optimize_shape(scene, {**base, "host_bin_faces": 1,
                                "rebin_every": 2, "rebin_margin": 4.0})
    np.testing.assert_allclose(r1["losses"][:, 0], r0["losses"][:, 0],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(r1["v_final"], r0["v_final"],
                               rtol=1e-3, atol=1e-5)


def test_slots_scatter_matches_segsum(scene):
    """The gather-based backward scatter (face_slots inverse,
    _scatter_via_slots) must produce identical gradients to the
    segment_sum scatter, through both prebinned pipelines."""
    r, topo, v_ndc, attrs = scene
    cap = 1280
    bins, counts, fslots, _ = pc.bin_triangles_device(
        v_ndc, topo.faces, r.res, cap, margin=2.0)
    K = int(fslots.shape[-1])
    for maker, kw in ((pc.make_render_pipeline, {"prebinned": True}),
                      (pc.make_render_pipeline_big, {})):
        pipe_seg = maker(topo.faces, topo.opp, r.res, shading=True,
                         boost=3.0, cap=cap, **kw)
        pipe_sl = maker(topo.faces, topo.opp, r.res, shading=True,
                        boost=3.0, cap=cap, slots_k=K, **kw)
        out0, g0, ga0 = _run(pipe_seg, v_ndc, attrs, r.bgs, (bins, counts))
        out1, g1, ga1 = _run(pipe_sl, v_ndc, attrs, r.bgs,
                             (bins, counts, fslots))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0),
                                   rtol=1e-5, atol=1e-6)


def test_big_pipeline_row_sharded_matches_single():
    """The large-F pipeline under shard_map with (dp, sp) BOTH > 1: cameras
    sharded over 'dp', image tile rows over 'sp' (in-graph bin-row slicing +
    AA halo ppermutes) must match the unsharded big pipeline."""
    from jax.sharding import PartitionSpec as P
    from largesteps_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = make_scene(source=("icosphere", 3), target=("gourd", 3),
                   n_views=4, res=128)
    s["res_y"], s["res_x"] = 64, 128
    r = Renderer(s, shading=True, boost=3)
    v = jnp.asarray(s["mesh-source"]["vertices"])
    f = s["mesh-source"]["faces"]
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    attrs = sh_eval(r.sh_M, n) / np.pi
    v_ndc = project(v, r.mvps)
    cap = 1280
    bins, counts, occ = pc.bin_triangles_host(
        np.asarray(v_ndc), topo.faces, r.res, cap=cap, margin=2.0)
    assert occ <= cap
    bins, counts = jnp.asarray(bins), jnp.asarray(counts)

    pipe1 = pc.make_render_pipeline_big(topo.faces, topo.opp, r.res,
                                        shading=True, boost=3.0, cap=cap)
    mesh = make_mesh(8, sp=2)
    pipe8 = pc.make_render_pipeline_big(topo.faces, topo.opp, r.res,
                                        shading=True, boost=3.0, cap=cap,
                                        row_shards=2, row_axis="sp")
    cam = P("dp")
    img = P("dp", "sp", None, None)
    sharded = jax.shard_map(
        lambda vc, at, bg, b, c: pipe8(vc, at, bg, b, c),
        mesh=mesh, in_specs=(cam, P(), img, cam, cam), out_specs=img,
        check_vma=False)

    out0 = pipe1(v_ndc, attrs, r.bgs, bins, counts)
    out1 = sharded(v_ndc, attrs, r.bgs, bins, counts)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=0, atol=1e-5)
    g0 = jax.grad(lambda vc: pipe1(vc, attrs, r.bgs, bins, counts).sum())(v_ndc)
    g1 = jax.grad(lambda vc: sharded(vc, attrs, r.bgs, bins, counts).sum())(v_ndc)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)


def test_big_pipeline_matches_batched(scene):
    """The camera-sequential large-F pipeline (Python-unrolled camera loop
    + planar glue + recompute-in-bwd) must match the batched traced-binning
    pipeline."""
    r, topo, v_ndc, attrs = scene
    pipe_small = pc.make_render_pipeline(topo.faces, topo.opp, r.res,
                                         shading=True, boost=3.0, cap=640)
    pipe_big = pc.make_render_pipeline_big(topo.faces, topo.opp, r.res,
                                           shading=True, boost=3.0, cap=1280)
    bins, counts, _ = pc.bin_triangles_host(
        np.asarray(v_ndc), topo.faces, r.res, cap=1280, margin=2.0)
    out0, g0, ga0 = _run(pipe_small, v_ndc, attrs, r.bgs)
    out1, g1, ga1 = _run(pipe_big, v_ndc, attrs, r.bgs,
                         (jnp.asarray(bins), jnp.asarray(counts)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga0),
                               rtol=1e-4, atol=1e-5)
