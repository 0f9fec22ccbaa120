"""Optimizers: AdamUniform as an optax-style gradient transformation.

Reference: largesteps/optimize.py:3-41 — Adam with standard biased first and
second moments, but the update divides by the **max over all components** of
√m̂2 of each parameter instead of elementwise:

    gr = m̂1 / (1e-8 + m̂2.sqrt().max())     (optimize.py:39-41)

This uniform second-moment scaling preserves the smoothness of the
(preconditioned) gradient direction and is essential to the method.

TPU notes: the per-parameter global max is a full reduction; on sharded
parameters XLA lowers it to an all-reduce over the mesh automatically under
``jit``; under ``shard_map`` use :func:`adam_uniform` with ``axis_names`` so
the max is explicitly ``lax.pmax``-ed.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

__all__ = ["adam_uniform", "AdamUniformState", "adam"]


class AdamUniformState(NamedTuple):
    count: jax.Array          # scalar int32
    g1: optax.Updates         # first moment, per leaf
    g2: optax.Updates         # second moment, per leaf


def adam_uniform(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    axis_names: Optional[Sequence[str]] = None,
) -> optax.GradientTransformation:
    """AdamUniform (reference largesteps/optimize.py) as a
    ``optax.GradientTransformation``.

    Defaults match the reference (lr is mandatory there; betas=(0.9, 0.999),
    eps=1e-8 hard-coded at optimize.py:10,40).
    """

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamUniformState(count=jnp.zeros([], jnp.int32), g1=zeros,
                                g2=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        g1 = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.g1, grads)
        g2 = jax.tree.map(lambda m, g: b2 * m + (1 - b2) * g * g, state.g2, grads)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf_update(m1, m2):
            m1_hat = m1 / c1
            m2_hat = m2 / c2
            denom = jnp.sqrt(jnp.max(m2_hat))
            if axis_names:
                for ax in axis_names:
                    denom = jax.lax.pmax(denom, ax)
            return -learning_rate * m1_hat / (eps + denom)

        updates = jax.tree.map(leaf_update, g1, g2)
        return updates, AdamUniformState(count=count, g1=g1, g2=g2)

    return optax.GradientTransformation(init, update)


def adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> optax.GradientTransformation:
    """Plain Adam for the baseline configurations (the reference passes
    ``torch.optim.Adam`` via params['optimizer'], scripts/main.py:41)."""
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
