"""Renderer components: SH lighting, texture sampling, backgrounds,
full shaded/silhouette renders."""
import numpy as np
import jax.numpy as jnp
import pytest

from largesteps_tpu.render.sh import sh_matrices, sh_eval, SphericalHarmonics
from largesteps_tpu.render.texture import texture_bilinear
from largesteps_tpu.render.renderer import Renderer, Topology, render_backgrounds
from largesteps_tpu.io.synth import make_scene, make_envmap
from largesteps_tpu.ops import icosphere
from largesteps_tpu.ops.normals import compute_face_normals, compute_vertex_normals


def numpy_sh_oracle(envmap, normals):
    """Transcription of the reference SH math (scripts/render.py:13-87)."""
    h, w = envmap.shape[:2]
    theta = np.linspace(0, np.pi, h)[:, None] * np.ones((1, w))
    phi = np.ones((h, 1)) * np.linspace(3 * np.pi, np.pi, w)[None, :]
    st = np.sin(theta)
    x = st * np.cos(phi)
    z = -st * np.sin(phi)
    y = np.cos(theta)
    Y0 = 0.282095 * np.ones_like(x)
    Y1 = {-1: 0.488603 * z, 0: 0.488603 * x, 1: 0.488603 * y}
    Y2 = {0: 0.315392 * (3 * z * z - 1), 1: 1.092548 * x * z,
          2: 0.546274 * (x * x - y * y), -2: 1.092548 * x * y,
          -1: 1.092548 * y * z}
    rad = envmap[..., :3]
    dt_dp = 2 * np.pi**2 / (w * h)
    integ = lambda Y: (rad * Y[..., None] * st[..., None] * dt_dp).sum((0, 1))
    L0 = {0: integ(Y0)}
    L1 = {p: integ(Y1[p]) for p in (-1, 0, 1)}
    L2 = {p: integ(Y2[p]) for p in (-2, -1, 0, 1, 2)}
    c1, c2, c3, c4, c5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708
    out = np.zeros((len(normals), 3))
    for c in range(3):
        M = np.array([
            [c1 * L2[2][c], c1 * L2[-2][c], c1 * L2[1][c], c2 * L1[1][c]],
            [c1 * L2[-2][c], -c1 * L2[2][c], c1 * L2[-1][c], c2 * L1[-1][c]],
            [c1 * L2[1][c], c1 * L2[-1][c], c3 * L2[0][c], c2 * L1[0][c]],
            [c2 * L1[1][c], c2 * L1[-1][c], c2 * L1[0][c],
             c4 * L0[0][c] - c5 * L2[0][c]],
        ])
        for i, n in enumerate(normals):
            hvec = np.array([n[0], n[1], n[2], 1.0])
            out[i, c] = hvec @ M @ hvec
    return out


def test_sh_matches_numpy_oracle():
    env = make_envmap(16, 32)
    rng = np.random.default_rng(0)
    n = rng.normal(size=(20, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    got = np.asarray(sh_eval(sh_matrices(jnp.asarray(env)), jnp.asarray(n, jnp.float32)))
    want = numpy_sh_oracle(env.astype(np.float64), n)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_sh_object_wrapper():
    env = make_envmap(8, 16)
    sh = SphericalHarmonics(env)
    out = sh.eval(jnp.asarray([[0.0, 1.0, 0.0]]))
    assert out.shape == (1, 3)


def test_texture_bilinear_exact_at_centers():
    tex = jnp.asarray(np.random.default_rng(1).random((8, 6, 3)).astype(np.float32))
    # uv hitting texel centers reproduces texels exactly
    ys, xs = np.mgrid[0:8, 0:6]
    uv = np.stack([(xs + 0.5) / 6, (ys + 0.5) / 8], axis=-1).astype(np.float32)
    out = texture_bilinear(tex, jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(out), np.asarray(tex), atol=1e-6)


def test_texture_bilinear_interpolates():
    tex = jnp.asarray([[[0.0], [1.0]]], jnp.float32)  # (1, 2, 1)
    uv = jnp.asarray([[0.5, 0.5]])
    out = texture_bilinear(tex, uv)
    np.testing.assert_allclose(float(out[0, 0]), 0.5, atol=1e-6)


@pytest.fixture(scope="module")
def scene():
    return make_scene(source=("icosphere", 2), target=("gourd", 2),
                      n_views=3, res=40)


def test_backgrounds_shape_and_alpha(scene):
    bgs = render_backgrounds(scene["envmap"], np.stack(scene["view_mats"]),
                             scene["fov"], (40, 40))
    assert bgs.shape == (3, 40, 40, 4)
    assert float(jnp.abs(bgs[..., -1]).max()) == 0.0
    assert float(bgs[..., :3].min()) >= 0.0


def test_shaded_render(scene):
    r = Renderer(scene, shading=True, boost=1)
    v = jnp.asarray(scene["mesh-target"]["vertices"])
    f = scene["mesh-target"]["faces"]
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    img = np.asarray(r.render(v, n, Topology(f)))
    assert img.shape == (3, 40, 40, 4)
    assert np.isfinite(img).all()
    # center pixel should be covered (alpha 1), corner should be background
    assert img[0, 20, 20, 3] > 0.5
    assert img[0, 1, 1, 3] < 0.5


def test_silhouette_render(scene):
    r = Renderer(scene, shading=False)
    v = jnp.asarray(scene["mesh-target"]["vertices"])
    f = scene["mesh-target"]["faces"]
    img = np.asarray(r.render(v, jnp.zeros_like(v), Topology(f)))
    assert img.shape == (3, 40, 40, 3)
    inside = img[0, 20, 20, 0]
    outside = img[0, 1, 1, 0]
    assert inside > 0.9 and outside < 0.1


def test_render_background_matches_envmap_color_range(scene):
    r = Renderer(scene, shading=True)
    v = jnp.asarray(scene["mesh-target"]["vertices"]) * 0.01  # tiny: mostly bg
    f = scene["mesh-target"]["faces"]
    fn = compute_face_normals(v, f)
    n = compute_vertex_normals(v, f, fn)
    img = np.asarray(r.render(v, n, Topology(f)))
    corner = img[0, 1, 1, :3]
    bg = np.asarray(r.bgs)[0, 1, 1, :3]
    np.testing.assert_allclose(corner, bg, atol=1e-5)
