"""I/O round-trips: PLY (binary/ascii), HDR/RGBE codec, mesh utilities."""
import numpy as np
import pytest

from largesteps_tpu.io.ply import read_ply, write_ply
from largesteps_tpu.io.hdr import read_hdr, write_hdr
from largesteps_tpu.ops import icosphere, massmatrix_voronoi
import jax.numpy as jnp


@pytest.mark.parametrize("ascii_", [False, True])
def test_ply_roundtrip(tmp_path, ascii_):
    v, f = icosphere(2)
    rng = np.random.default_rng(0)
    n = rng.normal(size=v.shape).astype(np.float32)
    path = str(tmp_path / f"mesh_{ascii_}.ply")
    write_ply(path, v, f, normals=n, ascii_=ascii_)
    out = read_ply(path)
    np.testing.assert_allclose(out["vertices"], v, atol=1e-5)
    np.testing.assert_array_equal(out["faces"], f)
    np.testing.assert_allclose(out["normals"], n, atol=1e-5)


def test_ply_colors_roundtrip(tmp_path):
    v, f = icosphere(1)
    colors = np.random.default_rng(1).integers(0, 255, (len(v), 3)).astype(np.uint8)
    path = str(tmp_path / "colored.ply")
    write_ply(path, v, f, colors=colors)
    out = read_ply(path)
    np.testing.assert_array_equal(out["colors"], colors)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = (rng.random((17, 33, 3)) * 10).astype(np.float32)
    path = str(tmp_path / "env.hdr")
    write_hdr(path, img)
    out = read_hdr(path)
    assert out.shape == img.shape
    # RGBE: shared 8-bit mantissa ⇒ error bounded by per-pixel max channel / 256
    bound = img.max(axis=-1, keepdims=True) / 256 + 1e-6
    assert (np.abs(out - img) <= bound).all()


def test_massmatrix_voronoi_sums_to_surface_area():
    v, f = icosphere(3)
    cells = np.asarray(massmatrix_voronoi(jnp.asarray(v), f))
    # total voronoi area == total mesh area
    fv = v[f]
    areas = 0.5 * np.linalg.norm(
        np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]), axis=1)
    np.testing.assert_allclose(cells.sum(), areas.sum(), rtol=1e-3)
    assert (cells > 0).all()
