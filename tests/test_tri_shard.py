"""Triangle/vertex sharding (parallel/tri_shard.py): allclose vs the
replicated implementations on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from largesteps_tpu.ops.shapes import icosphere
from largesteps_tpu.core.geometry import compute_matrix
from largesteps_tpu.core.sparse import coo_matvec
from largesteps_tpu.core.solvers import cg_solve, solve as diff_solve
from largesteps_tpu.core.parameterize import to_differential
from largesteps_tpu.parallel.sharding import make_mesh
from largesteps_tpu.parallel.tri_shard import (
    sharded_coo_matvec, sharded_cg_solve, ShardedCGSolver,
    sharded_vertex_gather)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8, sp=2)


@pytest.fixture(scope="module")
def system():
    v, f = icosphere(3)
    M = compute_matrix(v, f, lambda_=19.0)
    u = to_differential(M, jnp.asarray(v))
    return M, u, v, f


def test_sharded_matvec_allclose(mesh8, system):
    M, u, _, _ = system
    ref = coo_matvec(M, u)
    got = sharded_coo_matvec(M, u, mesh8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sharded_matvec_single_axis(mesh8, system):
    M, u, _, _ = system
    ref = coo_matvec(M, u)
    got = sharded_coo_matvec(M, u, mesh8, axes="dp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_sharded_cg_allclose(mesh8, system):
    M, u, _, _ = system
    ref = cg_solve(M, u, tol=1e-6)
    got = sharded_cg_solve(M, u, mesh8, tol=1e-6)
    # both converge to tol; compare against each other loosely and against
    # the residual definition tightly
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    res = coo_matvec(M, got) - u
    # f32 recurrence residual drifts from the true residual; bound relative
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(u))
    assert rel < 1e-4


def test_sharded_solver_differentiable(mesh8, system):
    """ShardedCGSolver through the differentiable solve wrapper under jit:
    gradient equals the replicated CG path's gradient (M = Mᵀ trick)."""
    M, u, _, _ = system
    slv = ShardedCGSolver(M, mesh8, tol=1e-8)

    @jax.jit
    def loss_sharded(uu, s):
        return jnp.sum(diff_solve(s, uu) ** 2)

    from largesteps_tpu.core.parameterize import get_solver
    ref_slv = get_solver(M, "CG")

    def loss_ref(uu):
        return jnp.sum(diff_solve(ref_slv, uu) ** 2)

    g_sh = jax.grad(loss_sharded)(u, slv)
    g_ref = jax.grad(loss_ref)(u)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_sharded_vertex_gather(mesh8, system):
    from largesteps_tpu.render.pallas_core import build_incidence
    _, _, v, f = system
    V = v.shape[0]
    F = f.shape[0]
    inc = build_incidence(f, V)
    rng = np.random.default_rng(0)
    C, Q = 3, 7
    table = rng.standard_normal((C, (F + 1) * 3, Q)).astype(np.float32)
    # zero the padding sentinel rows (3F..3F+2), as the real table does
    table[:, 3 * F:] = 0.0
    table = jnp.asarray(table)

    # replicated oracle: the gather stage of _scatter_via_faces
    idx, mask = inc
    gathered = jnp.take(table, jnp.asarray(idx.reshape(-1)), axis=1)
    gathered = gathered.reshape(C, *idx.shape, Q)
    gathered = gathered * jnp.asarray(mask, jnp.float32)[None, :, :, None]
    ref = gathered.sum(axis=2)

    got = sharded_vertex_gather(table, inc, mesh8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
