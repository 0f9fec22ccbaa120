"""Pallas kernel tests (interpret mode on CPU).

The fused Pallas pipeline (render/pallas_core.py) is validated against the
pure-XLA modular ops (render/raster.py, render/antialias.py), which are
themselves golden-tested against tests/oracle.py.  Covers: forward
rasterize+interpolate parity, analytic backward vs XLA autodiff, antialias
fwd/bwd vs the dense oracle, full-pipeline parity through the Renderer, and
the bin-overflow policy (deterministic under-draw, never corruption).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.io.synth import make_scene
from largesteps_tpu.render.camera import project
from largesteps_tpu.render.raster import rasterize, interpolate
from largesteps_tpu.render.antialias import antialias_dense, face_adjacency
from largesteps_tpu.render import pallas_core as pc
from largesteps_tpu.render.renderer import Renderer, Topology
from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals

H = W = 128
CAP = 256


@pytest.fixture(scope="module")
def scene():
    return make_scene(source=("icosphere", 2), target=("gourd", 2),
                      n_views=2, res=H)


@pytest.fixture(scope="module")
def geo(scene):
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = np.asarray(scene["mesh-source"]["faces"], np.int32)
    opp = face_adjacency(f)
    renderer = Renderer(scene, shading=True, boost=3, backend="xla")
    v_ndc = project(v, renderer.mvps)
    attrs = jax.random.normal(jax.random.PRNGKey(0), (v.shape[0], 3))
    return v, f, opp, renderer, v_ndc, attrs


def test_fwd_matches_xla(geo):
    v, f, opp, renderer, v_ndc, attrs = geo
    fj = jnp.asarray(f)
    rast_ref = rasterize(v_ndc, fj, (H, W), 128)
    col_ref = interpolate(attrs, rast_ref, fj)

    rast, slot, col = pc.render_core(v_ndc, attrs, f, opp, (H, W), CAP)
    m = rast_ref[..., 3] > 0
    assert bool(jnp.all(rast[..., 3] == rast_ref[..., 3]))        # ids exact
    assert float(jnp.max(jnp.abs(jnp.where(
        m, rast[..., 0] - rast_ref[..., 0], 0.0)))) < 1e-4
    assert float(jnp.max(jnp.abs(jnp.where(
        m, rast[..., 1] - rast_ref[..., 1], 0.0)))) < 1e-4
    assert float(jnp.max(jnp.abs(jnp.where(
        m[..., None], col - col_ref, 0.0)))) < 5e-4
    assert bool(jnp.all((slot >= 0) == m))


def test_bwd_matches_autodiff(geo):
    v, f, opp, renderer, v_ndc, attrs = geo
    fj = jnp.asarray(f)
    wc = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3))
    wu = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, 2))

    def loss_xla(vc, at):
        rast = rasterize(vc, fj, (H, W), 128)
        col = interpolate(at, rast, fj)
        return (wc * col).sum() + (wu * rast[..., :2]).sum()

    core = pc.make_render_core(f, opp, (H, W), CAP)

    def loss_pallas(vc, at):
        rast, slot, col = core(vc, at)
        return (wc * col).sum() + (wu * rast[..., :2]).sum()

    g1v, g1a = jax.grad(loss_xla, argnums=(0, 1))(v_ndc, attrs)
    g2v, g2a = jax.grad(loss_pallas, argnums=(0, 1))(v_ndc, attrs)
    sv = float(jnp.max(jnp.abs(g1v)))
    assert float(jnp.max(jnp.abs(g1v - g2v))) < 1e-4 * sv
    sa = float(jnp.max(jnp.abs(g1a)))
    assert float(jnp.max(jnp.abs(g1a - g2a))) < 1e-4 * sa


def test_bwd_cancellation_tolerance(geo):
    """Documents the accepted 2-term-bf16 backward tolerance (ADVICE r4):
    ``_onehot_reduce`` splits per-pixel gradients into 2 bf16 terms
    (~1.5e-5 relative each); a CONSTANT cotangent over a closed object is
    the cancellation-heavy case — per-slot sums add many opposing-sign
    contributions, so the error bound must be stated against the gradient
    SCALE (max |g|), not element-wise relative.  Accepted: 2e-4 · max|g|."""
    v, f, opp, renderer, v_ndc, attrs = geo
    fj = jnp.asarray(f)

    def loss_xla(vc, at):
        rast = rasterize(vc, fj, (H, W), 128)
        col = interpolate(at, rast, fj)
        return col.sum() + rast[..., :2].sum()

    core = pc.make_render_core(f, opp, (H, W), CAP)

    def loss_pallas(vc, at):
        rast, slot, col = core(vc, at)
        return col.sum() + rast[..., :2].sum()

    g1v, g1a = jax.grad(loss_xla, argnums=(0, 1))(v_ndc, attrs)
    g2v, g2a = jax.grad(loss_pallas, argnums=(0, 1))(v_ndc, attrs)
    sv = float(jnp.max(jnp.abs(g1v)))
    err_v = float(jnp.max(jnp.abs(g1v - g2v)))
    assert err_v < 2e-4 * sv, (err_v, sv)
    sa = float(jnp.max(jnp.abs(g1a)))
    err_a = float(jnp.max(jnp.abs(g1a - g2a)))
    assert err_a < 2e-4 * sa, (err_a, sa)


def test_antialias_matches_dense_oracle(geo):
    v, f, opp, renderer, v_ndc, attrs = geo
    fj = jnp.asarray(f)
    oj = jnp.asarray(opp)
    rast = rasterize(v_ndc, fj, (H, W), 128)
    col3 = interpolate(attrs, rast, fj)
    cov = rast[..., 3:4] != 0
    col4 = jnp.where(cov, jnp.concatenate(
        [col3, jnp.ones_like(col3[..., :1])], -1), jnp.asarray(renderer.bgs))

    _, rbb, bins, counts = pc._setup_and_bin(
        v_ndc, fj, attrs, oj, H, W, CAP)
    fid, z = rast[..., 3], rast[..., 2]
    out_p = pc.aa_fwd_pallas(rbb, counts, fid, z, col4, (H, W), CAP, D=4)
    out_o = antialias_dense(col4, rast, v_ndc, fj, oj, 1.0)
    assert float(jnp.max(jnp.abs(out_p - out_o))) < 1e-5

    wts = jax.random.normal(jax.random.PRNGKey(3), out_o.shape)
    go_c, go_v = jax.grad(
        lambda c4, vc: (wts * antialias_dense(c4, rast, vc, fj, oj, 1.0)).sum(),
        argnums=(0, 1))(col4, v_ndc)
    dcol_p, dslot_aa = pc.aa_bwd_pallas(rbb, counts, fid, z, col4, wts,
                                        (H, W), CAP, D=4)
    assert float(jnp.max(jnp.abs(dcol_p - go_c))) < 1e-5
    dslot32 = jnp.concatenate(
        [dslot_aa[..., :6], jnp.zeros((*dslot_aa.shape[:-1], 26))], axis=-1)
    table21 = pc._chain_planes(dslot32, None, 0.0, rbb)
    inc = pc.build_incidence(np.asarray(f), v_ndc.shape[1])
    dv_p, _ = pc._scatter_via_faces(table21, bins, inc, int(fj.shape[0]),
                                    v_ndc.shape[1])
    sv = float(jnp.max(jnp.abs(go_v)))
    assert float(jnp.max(jnp.abs(dv_p - go_v))) < 1e-4 * sv


@pytest.mark.parametrize("shading", [True, False])
def test_pipeline_matches_xla_chain(scene, geo, shading):
    v, f, opp, renderer, v_ndc, _ = geo
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    rp = Renderer(scene, shading=shading, boost=3, backend="pallas",
                  bin_cap=CAP)
    ip = rp.render(v, n, topo)

    # XLA chain with the capacity-free dense antialias as the oracle
    from largesteps_tpu.render.sh import sh_eval
    fj = jnp.asarray(f)
    oj = jnp.asarray(opp)
    rast = rasterize(v_ndc, fj, (H, W), 128)
    if shading:
        light = interpolate(sh_eval(rp.sh_M, n), rast, fj)
        col = jnp.concatenate(
            [light / np.pi, jnp.ones_like(light[..., :1])], -1)
        comp = jnp.where(rast[..., 3:4] != 0, col, jnp.asarray(rp.bgs))
    else:
        comp = interpolate(jnp.ones_like(v), rast, fj)
    ix = antialias_dense(comp, rast, v_ndc, fj, oj, 3.0)
    # boundary pixels may flip coverage between the two (equally valid)
    # f32 formulations; differences are confined to antialias blends
    assert float(jnp.max(jnp.abs(ix - ip))) < 5e-3

    w = jax.random.normal(jax.random.PRNGKey(4), ix.shape)

    def loss(r_, vv):
        fn_ = compute_face_normals(vv, f)
        n_ = compute_vertex_normals(vv, f, fn_)
        return (w * r_.render(vv, n_, topo)).sum()

    def loss_oracle(vv):
        fn_ = compute_face_normals(vv, f)
        n_ = compute_vertex_normals(vv, f, fn_)
        vc = project(vv, rp.mvps)
        rast_ = rasterize(vc, fj, (H, W), 128)
        if shading:
            light_ = interpolate(sh_eval(rp.sh_M, n_), rast_, fj)
            col_ = jnp.concatenate(
                [light_ / np.pi, jnp.ones_like(light_[..., :1])], -1)
            comp_ = jnp.where(rast_[..., 3:4] != 0, col_, jnp.asarray(rp.bgs))
        else:
            comp_ = interpolate(jnp.ones_like(vv), rast_, fj)
        return (w * antialias_dense(comp_, rast_, vc, fj, oj, 3.0)).sum()

    gp = jax.grad(lambda vv: loss(rp, vv))(v)
    go = jax.grad(loss_oracle)(v)
    s = float(jnp.max(jnp.abs(go)))
    assert float(jnp.max(jnp.abs(gp - go))) < 1e-3 * s


def test_bin_overflow_underdraws_deterministically(geo):
    """cap below occupancy: earliest-id triangles survive, no corruption."""
    v, f, opp, renderer, v_ndc, attrs = geo
    fj = jnp.asarray(f)
    rast_full, _, _ = pc.render_core(v_ndc, attrs, f, opp, (H, W), CAP)
    tiny_cap = 16
    rast_tiny, _, _ = pc.render_core(v_ndc, attrs, f, opp, (H, W), tiny_cap)
    ids_full = np.asarray(rast_full[..., 3])
    ids_tiny = np.asarray(rast_tiny[..., 3])
    # under-draw only: dropping triangles can change or clear a pixel's
    # winner but can never cover a pixel the full run leaves uncovered
    assert np.all((ids_tiny > 0) <= (ids_full > 0))
    assert (ids_tiny > 0).sum() < (ids_full > 0).sum()
    assert np.isfinite(np.asarray(rast_tiny)).all()
    # a capacity at or above occupancy reproduces the full image exactly
    occ = pc.check_bin_overflow(v_ndc, fj, (H, W))
    cap_ok = pc.suggest_cap(occ)
    rast_ok, _, _ = pc.render_core(v_ndc, attrs, f, opp, (H, W), cap_ok)
    assert np.array_equal(np.asarray(rast_ok[..., 3]), ids_full)


def test_check_bin_overflow(geo):
    v, f, opp, renderer, v_ndc, attrs = geo
    occ = pc.check_bin_overflow(v_ndc, jnp.asarray(f), (H, W))
    assert 0 < occ <= f.shape[0]
    assert pc.suggest_cap(occ) >= occ


def test_pipeline_trace_safe(scene, geo):
    """Regression (round-2 bench crash): a Topology whose pipe cache was
    populated under one jit trace must be reusable under a second trace and
    eagerly — no UnexpectedTracerError, identical images."""
    v, f, opp, renderer, v_ndc, _ = geo
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    rp = Renderer(scene, shading=True, boost=3, backend="pallas", bin_cap=CAP)

    @jax.jit
    def render_a(vv):
        return rp.render(vv, n, topo)          # first trace builds the pipe

    @jax.jit
    def render_b(vv):
        return rp.render(vv, n, topo) * 1.0    # second, different trace

    ia = render_a(v)
    ib = render_b(v)
    ie = rp.render(v, n, topo)                 # eager reuse
    assert float(jnp.max(jnp.abs(ia - ib))) == 0.0
    # eager pays different XLA fusion rounding than the jitted traces
    assert float(jnp.max(jnp.abs(ia - ie))) < 1e-5
