"""Rasterize/interpolate/antialias: golden vs numpy oracle + gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.render import rasterize, interpolate, antialias, face_adjacency
from largesteps_tpu.render.camera import persp_proj, build_mvps, project
from largesteps_tpu.ops import icosphere

from oracle import oracle_rasterize, oracle_interpolate


def simple_view(distance=3.0):
    view = np.eye(4, dtype=np.float32)
    view[2, 3] = distance  # camera at z=-distance looking +z (w' = +z proj)
    return view


def clip_verts(v, distance=3.0, fov=45.0):
    proj = persp_proj(fov, 1.0, 0.1, 100.0)
    mvps = build_mvps(proj, simple_view(distance)[None])
    return project(jnp.asarray(v, jnp.float32), jnp.asarray(mvps))


@pytest.fixture(scope="module")
def tri_scene():
    v = np.array([[-0.6, -0.5, 0.0], [0.7, -0.4, 0.0], [0.0, 0.8, 0.0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    return v, f


def test_single_triangle_matches_oracle(tri_scene):
    v, f = tri_scene
    vc = clip_verts(v)
    H = W = 32
    rast = np.asarray(rasterize(vc, jnp.asarray(f), (H, W), 8))[0]
    gold = oracle_rasterize(np.asarray(vc)[0].astype(np.float64), f, H, W)
    np.testing.assert_array_equal(rast[..., 3], gold[..., 3])
    m = gold[..., 3] > 0
    assert m.sum() > 50
    np.testing.assert_allclose(rast[..., 0][m], gold[..., 0][m], atol=1e-5)
    np.testing.assert_allclose(rast[..., 1][m], gold[..., 1][m], atol=1e-5)
    np.testing.assert_allclose(rast[..., 2][m], gold[..., 2][m], atol=1e-5)


def test_sphere_matches_oracle():
    v, f = icosphere(1)
    vc = clip_verts(v)
    H = W = 48
    rast = np.asarray(rasterize(vc, jnp.asarray(f), (H, W), 16))[0]
    gold = oracle_rasterize(np.asarray(vc)[0].astype(np.float64), f, H, W)
    # occlusion: ids must agree except where front/back depths are within
    # float32 z-fighting range
    ids_match = rast[..., 3] == gold[..., 3]
    assert ids_match.mean() > 0.995
    m = (gold[..., 3] > 0) & ids_match
    np.testing.assert_allclose(rast[..., 0][m], gold[..., 0][m], atol=2e-4)
    np.testing.assert_allclose(rast[..., 1][m], gold[..., 1][m], atol=2e-4)


def test_interpolate_matches_oracle(tri_scene):
    v, f = tri_scene
    vc = clip_verts(v)
    H = W = 24
    rast = rasterize(vc, jnp.asarray(f), (H, W), 8)
    attr = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    out = np.asarray(interpolate(jnp.asarray(attr), rast, jnp.asarray(f)))[0]
    gold = oracle_interpolate(attr, np.asarray(rast)[0].astype(np.float64), f)
    np.testing.assert_allclose(out, gold, atol=1e-5)


def test_barycentric_gradient_finite_difference(tri_scene):
    """∂u/∂(clip coords) at an interior pixel matches finite differences
    (the analytic rasterize backward, nvdiffrast semantics)."""
    v, f = tri_scene
    H = W = 32
    fj = jnp.asarray(f)

    def u_at(vc, i, j):
        rast = rasterize(vc, fj, (H, W), 8)
        return rast[0, i, j, 0] + 0.5 * rast[0, i, j, 1]

    vc0 = clip_verts(v)
    rast0 = np.asarray(rasterize(vc0, fj, (H, W), 8))[0]
    ii, jj = H // 2, W // 2
    assert rast0[ii, jj, 3] == 1  # interior pixel

    g = jax.grad(lambda vc: u_at(vc, ii, jj))(vc0)
    rng = np.random.default_rng(3)
    eps = 1e-3
    for _ in range(3):
        d = rng.normal(size=vc0.shape).astype(np.float32)
        d /= np.linalg.norm(d)
        fd = (u_at(vc0 + eps * d, ii, jj) - u_at(vc0 - eps * d, ii, jj)) / (2 * eps)
        an = float(jnp.vdot(g, d))
        assert abs(an - float(fd)) < 5e-3 * max(1.0, abs(an)), (an, float(fd))


def test_antialias_only_touches_silhouette(tri_scene):
    v, f = tri_scene
    vc = clip_verts(v)
    H = W = 32
    fj = jnp.asarray(f)
    rast = rasterize(vc, fj, (H, W), 8)
    col = interpolate(jnp.ones((3, 3)), rast, fj)
    out = antialias(col, rast, vc, fj, face_adjacency(f))
    col_np, out_np = np.asarray(col), np.asarray(out)
    changed = np.any(col_np != out_np, axis=-1)[0]
    ids = np.asarray(rast)[0, ..., 3]
    # every changed pixel borders a pixel with a different id
    neigh_diff = np.zeros_like(changed)
    neigh_diff[:, :-1] |= ids[:, :-1] != ids[:, 1:]
    neigh_diff[:, 1:] |= ids[:, :-1] != ids[:, 1:]
    neigh_diff[:-1] |= ids[:-1] != ids[1:]
    neigh_diff[1:] |= ids[:-1] != ids[1:]
    assert changed.sum() > 10
    assert (changed <= neigh_diff).all()
    # AA moves coverage toward the true area: mean stays within the pair
    assert 0 < out_np.mean() < 1


def test_antialias_position_gradient_matches_fd(tri_scene):
    """The silhouette position gradient: FD of the *antialiased* image mean
    w.r.t. a vertex translation matches autodiff (silhouette mode: AA is the
    only position-gradient source, SURVEY N1)."""
    v, f = tri_scene
    H = W = 32
    fj = jnp.asarray(f)
    opp = face_adjacency(f)

    def loss(vc):
        rast = rasterize(vc, fj, (H, W), 8)
        col = interpolate(jnp.ones((3, 3)), rast, fj)
        out = antialias(col, rast, vc, fj, opp)
        return out.mean()

    vc0 = clip_verts(v)
    g = jax.grad(loss)(vc0)
    assert float(jnp.abs(g).sum()) > 0
    eps = 2e-4  # stay within one linear piece of the AA response
    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(5):
        d = np.zeros(vc0.shape, np.float32)
        d[0, rng.integers(3), rng.integers(2)] = 1.0
        fd = float((loss(vc0 + eps * d) - loss(vc0 - eps * d)) / (2 * eps))
        an = float(jnp.vdot(g, d))
        if abs(fd) < 1e-7 and abs(an) < 1e-7:
            continue
        assert abs(an - fd) < 0.35 * max(abs(an), abs(fd)), (an, fd)
        checked += 1
    assert checked >= 2


def test_antialias_boost_scales_position_grads(tri_scene):
    v, f = tri_scene
    H = W = 16
    fj = jnp.asarray(f)
    opp = face_adjacency(f)

    vc0 = clip_verts(v)

    # isolate AA grads: detach the rasterize path
    def loss_aa_only(vc, boost):
        vc_d = jax.lax.stop_gradient(vc)
        rast = rasterize(vc_d, fj, (H, W), 8)
        col = interpolate(jnp.ones((3, 3)), rast, fj)
        return antialias(col, rast, vc, fj, opp, boost).mean()

    g1 = jax.grad(loss_aa_only)(vc0, 1.0)
    g3 = jax.grad(loss_aa_only)(vc0, 3.0)
    np.testing.assert_allclose(np.asarray(g3), 3 * np.asarray(g1), rtol=1e-4, atol=1e-8)


def test_face_adjacency():
    v, f = icosphere(0)
    opp = face_adjacency(f)
    assert (opp >= 0).all()  # closed mesh: no boundary edges
    # adjacency is symmetric: if opp[f][e] = g then some edge of g maps back
    for fi in range(len(f)):
        for e in range(3):
            g = opp[fi, e]
            assert fi in opp[g]


def test_antialias_sparse_matches_dense():
    """The compacted boundary-pair path must equal the dense oracle exactly
    (same math on the selected pairs; capacity auto-sized), for both the
    image and the position gradient."""
    from largesteps_tpu.render.antialias import antialias_dense

    v, f = icosphere(2)
    vc = clip_verts(v)
    fj = jnp.asarray(f)
    opp = face_adjacency(f)
    H = W = 64
    rast = rasterize(vc, fj, (H, W), 32)
    col = interpolate(jnp.ones_like(jnp.asarray(v)), rast, fj)

    out_s = antialias(col, rast, vc, fj, opp, 3.0)
    out_d = antialias_dense(col, rast, vc, fj, opp, 3.0)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), atol=1e-6)

    g_s = jax.grad(lambda x: antialias(col, rast, x, fj, opp, 3.0).mean())(vc)
    g_d = jax.grad(lambda x: antialias_dense(col, rast, x, fj, opp, 3.0).mean())(vc)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), atol=1e-6)
