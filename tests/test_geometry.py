"""Laplacian assembly vs dense numpy oracles (SURVEY §4 test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.core import (
    compute_matrix, laplacian_uniform, laplacian_cot, coo_matvec, from_coo,
)
from largesteps_tpu.ops import icosphere, remove_duplicates


def dense_laplacian_uniform(n, faces):
    """Oracle: L = D − A over unique undirected edges."""
    L = np.zeros((n, n))
    edges = set()
    for (a, b, c) in faces:
        for i, j in [(a, b), (b, c), (c, a)]:
            edges.add((min(i, j), max(i, j)))
    for i, j in edges:
        L[i, j] = L[j, i] = -1.0
        L[i, i] += 1.0
        L[j, j] += 1.0
    return L


def dense_laplacian_cot(verts, faces):
    """Oracle following the reference formula (largesteps/geometry.py:3-63)."""
    n = len(verts)
    W = np.zeros((n, n))
    for f in faces:
        v0, v1, v2 = verts[f[0]], verts[f[1]], verts[f[2]]
        A = np.linalg.norm(v1 - v2)
        B = np.linalg.norm(v0 - v2)
        C = np.linalg.norm(v0 - v1)
        s = 0.5 * (A + B + C)
        area = np.sqrt(max(s * (s - A) * (s - B) * (s - C), 1e-12))
        cota = (B**2 + C**2 - A**2) / area / 4
        cotb = (A**2 + C**2 - B**2) / area / 4
        cotc = (A**2 + B**2 - C**2) / area / 4
        for (i, j, w) in [(f[1], f[2], cota), (f[2], f[0], cotb), (f[0], f[1], cotc)]:
            W[i, j] += w
            W[j, i] += w
    return np.diag(W.sum(axis=0)) - W


@pytest.fixture(scope="module")
def sphere():
    return icosphere(2)


def test_sparse_coalesce_and_matvec(rng):
    n = 11
    rows = rng.integers(0, n, 60)
    cols = rng.integers(0, n, 60)
    vals = rng.normal(size=60)
    A = from_coo(rows, cols, vals, (n, n))
    dense = np.zeros((n, n))
    for r, c, v in zip(rows, cols, vals):
        dense[r, c] += v
    x = rng.normal(size=(n, 3))
    np.testing.assert_allclose(coo_matvec(A, jnp.asarray(x)), dense @ x, rtol=1e-5)
    np.testing.assert_allclose(A.todense(), dense, rtol=1e-5)
    np.testing.assert_allclose(A.transpose().todense(), dense.T, rtol=1e-5)


def test_laplacian_uniform_matches_dense(sphere):
    v, f = sphere
    L = laplacian_uniform(len(v), f)
    np.testing.assert_allclose(L.todense(), dense_laplacian_uniform(len(v), f), atol=1e-6)


def test_laplacian_cot_matches_dense(sphere):
    v, f = sphere
    L = laplacian_cot(jnp.asarray(v, jnp.float32), f)
    np.testing.assert_allclose(
        L.todense(), dense_laplacian_cot(v.astype(np.float64), f), rtol=2e-4, atol=1e-4
    )


def test_compute_matrix_lambda(sphere):
    v, f = sphere
    lam = 19.0
    M = compute_matrix(v, f, lambda_=lam)
    expected = np.eye(len(v)) + lam * dense_laplacian_uniform(len(v), f)
    np.testing.assert_allclose(M.todense(), expected, atol=1e-4)


def test_compute_matrix_alpha_validation(sphere):
    v, f = sphere
    with pytest.raises(ValueError):
        compute_matrix(v, f, alpha=1.0)
    M = compute_matrix(v, f, alpha=0.9)
    expected = 0.1 * np.eye(len(v)) + 0.9 * dense_laplacian_uniform(len(v), f)
    np.testing.assert_allclose(M.todense(), expected, atol=1e-4)


def test_laplacian_cot_differentiable(sphere):
    v, f = sphere

    def energy(verts):
        L = laplacian_cot(verts, f)
        return jnp.sum((coo_matvec(L, verts)) ** 2)

    g = jax.grad(energy)(jnp.asarray(v, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on a few coordinates
    e0 = energy(jnp.asarray(v))
    eps = 1e-3
    for idx in [(0, 0), (5, 1), (17, 2)]:
        vp = np.array(v, dtype=np.float64)
        vp[idx] += eps
        vm = np.array(v, dtype=np.float64)
        vm[idx] -= eps
        fd = (energy(jnp.asarray(vp, jnp.float32)) - energy(jnp.asarray(vm, jnp.float32))) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 3e-2 * max(1.0, abs(float(fd)))


def test_remove_duplicates():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0]], dtype=np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    vu, fu, dup = remove_duplicates(v, f)
    assert len(vu) == 3
    np.testing.assert_allclose(vu[dup], v)
    # faces 1 and 3 welded to the same vertex
    assert fu[0][1] == fu[1][2]
