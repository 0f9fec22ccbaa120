"""AdamUniform step equivalence vs a numpy transcription of the reference
algorithm (largesteps/optimize.py:17-41), per SURVEY §4."""
import numpy as np
import jax
import jax.numpy as jnp

from largesteps_tpu.core import adam_uniform


def reference_adam_uniform_steps(p0, grads, lr, b1=0.9, b2=0.999):
    """Numpy oracle of AdamUniform.step (largesteps/optimize.py:17-41)."""
    p = p0.copy()
    g1 = np.zeros_like(p)
    g2 = np.zeros_like(p)
    out = []
    for step, g in enumerate(grads, start=1):
        g1 = b1 * g1 + (1 - b1) * g
        g2 = b2 * g2 + (1 - b2) * g * g
        m1 = g1 / (1 - b1**step)
        m2 = g2 / (1 - b2**step)
        gr = m1 / (1e-8 + np.sqrt(m2).max())
        p = p - lr * gr
        out.append(p.copy())
    return out


def test_adam_uniform_matches_reference():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 3)).astype(np.float32)
    grads = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(5)]
    lr = 0.07

    tx = adam_uniform(lr)
    params = jnp.asarray(p0)
    state = tx.init(params)
    ref = reference_adam_uniform_steps(p0.astype(np.float64),
                                       [g.astype(np.float64) for g in grads], lr)
    for g, expected in zip(grads, ref):
        updates, state = tx.update(jnp.asarray(g), state)
        params = params + updates
        np.testing.assert_allclose(np.asarray(params), expected, rtol=1e-3, atol=5e-5)


def test_adam_uniform_per_leaf_max():
    """The √m2 max is per parameter leaf, not global across leaves."""
    tx = adam_uniform(1.0, b1=0.0, b2=0.0)
    params = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    grads = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([100.0, 200.0])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state)
    # with b1=b2=0: m1=g, m2=g²; denom = max|g| per leaf
    np.testing.assert_allclose(np.asarray(updates["a"]), [-0.5, -1.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["b"]), [-0.5, -1.0], rtol=1e-5)


def test_adam_uniform_under_jit_scan():
    tx = adam_uniform(0.1)
    p = jnp.ones((4, 3))
    state = tx.init(p)

    def body(carry, g):
        p, s = carry
        upd, s = tx.update(g, s)
        return (p + upd, s), None

    gs = jnp.ones((10, 4, 3))
    (pf, _), _ = jax.lax.scan(body, (p, state), gs)
    assert np.isfinite(np.asarray(pf)).all()
    # constant gradient=1 with uniform scaling: update ≈ -lr each step
    np.testing.assert_allclose(np.asarray(pf), 1.0 - 0.1 * 10 * np.ones((4, 3)), atol=1e-3)
