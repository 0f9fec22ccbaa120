"""Compiled-kernel parity on the real TPU chip (run: LS_TEST_TPU=1 pytest
tests/test_tpu_hardware.py).

Everything else in the suite exercises the Pallas kernels in INTERPRET mode
on a CPU mesh; a Mosaic miscompile would be invisible there.  These tests
compile the actual kernels for the chip and compare against the pure-XLA
oracle path running on the same device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

H = W = 128
CAP = 256


@pytest.fixture(scope="module")
def geo():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from largesteps_tpu.io.synth import make_scene
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render.antialias import face_adjacency
    from largesteps_tpu.render.renderer import Renderer

    scene = make_scene(source=("icosphere", 2), target=("gourd", 2),
                       n_views=2, res=H)
    v = jnp.asarray(scene["mesh-source"]["vertices"])
    f = np.asarray(scene["mesh-source"]["faces"], np.int32)
    opp = face_adjacency(f)
    renderer = Renderer(scene, shading=True, boost=3, backend="xla")
    v_ndc = project(v, renderer.mvps)
    attrs = jax.random.normal(jax.random.PRNGKey(0), (v.shape[0], 3))
    return scene, v, f, opp, renderer, v_ndc, attrs


def test_compiled_fwd_matches_xla(geo):
    from largesteps_tpu.render.raster import rasterize, interpolate
    from largesteps_tpu.render import pallas_core as pc

    scene, v, f, opp, renderer, v_ndc, attrs = geo
    assert jax.default_backend() == "tpu"
    fj = jnp.asarray(f)
    rast_ref = rasterize(v_ndc, fj, (H, W), 128)
    col_ref = interpolate(attrs, rast_ref, fj)
    rast, slot, col = pc.render_core(v_ndc, attrs, f, opp, (H, W), CAP)

    m = rast_ref[..., 3] > 0
    # compiled Mosaic vs XLA on the same chip: ids must agree exactly
    assert bool(jnp.all(rast[..., 3] == rast_ref[..., 3]))
    assert float(jnp.max(jnp.abs(jnp.where(
        m, rast[..., 0] - rast_ref[..., 0], 0.0)))) < 5e-4
    assert float(jnp.max(jnp.abs(jnp.where(
        m, rast[..., 1] - rast_ref[..., 1], 0.0)))) < 5e-4
    assert float(jnp.max(jnp.abs(jnp.where(
        m[..., None], col - col_ref, 0.0)))) < 2e-3


def test_compiled_pipeline_grad_matches_xla(geo):
    from largesteps_tpu.render.raster import rasterize, interpolate
    from largesteps_tpu.render.antialias import antialias_dense
    from largesteps_tpu.render.camera import project
    from largesteps_tpu.render.renderer import Renderer, Topology
    from largesteps_tpu.render.sh import sh_eval
    from largesteps_tpu.ops.normals import (compute_face_normals,
                                            compute_vertex_normals)

    scene, v, f, opp, renderer, v_ndc, attrs = geo
    topo = Topology(f)
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    rp = Renderer(scene, shading=True, boost=3, backend="pallas",
                  bin_cap=CAP)
    fj = jnp.asarray(f)
    oj = jnp.asarray(opp)
    w = jax.random.normal(jax.random.PRNGKey(4), (2, H, W, 4))

    @jax.jit
    def loss_pallas(vv):
        fn_ = compute_face_normals(vv, f)
        n_ = compute_vertex_normals(vv, f, fn_)
        return (w * rp.render(vv, n_, topo)).sum()

    @jax.jit
    def loss_oracle(vv):
        fn_ = compute_face_normals(vv, f)
        n_ = compute_vertex_normals(vv, f, fn_)
        vc = project(vv, rp.mvps)
        rast_ = rasterize(vc, fj, (H, W), 128)
        light_ = interpolate(sh_eval(rp.sh_M, n_), rast_, fj)
        col_ = jnp.concatenate(
            [light_ / np.pi, jnp.ones_like(light_[..., :1])], -1)
        comp_ = jnp.where(rast_[..., 3:4] != 0, col_, jnp.asarray(rp.bgs))
        return (w * antialias_dense(comp_, rast_, vc, fj, oj, 3.0)).sum()

    ip = jax.jit(lambda vv: rp.render(
        vv, compute_vertex_normals(vv, f, compute_face_normals(vv, f)),
        topo))(v)
    gp = jax.grad(loss_pallas)(v)
    go = jax.grad(loss_oracle)(v)
    assert np.isfinite(np.asarray(ip)).all()
    s = float(jnp.max(jnp.abs(go)))
    assert float(jnp.max(jnp.abs(gp - go))) < 2e-3 * s


def test_compiled_solver_roundtrip():
    from largesteps_tpu.ops.shapes import icosphere
    from largesteps_tpu.core.geometry import compute_matrix
    from largesteps_tpu.core.parameterize import to_differential, get_solver
    from largesteps_tpu.core.solvers import solve as diff_solve

    v, f = icosphere(3)
    vj = jnp.asarray(v)
    M = compute_matrix(v, f, lambda_=19.0)
    solver = get_solver(M, "Cholesky")
    u = to_differential(M, vj)
    v_rt = diff_solve(solver, u)
    assert float(jnp.max(jnp.abs(v_rt - vj))) < 1e-4
