"""Bilinear texture sampling (the ``dr.texture`` surface used by the
reference for static env backgrounds, scripts/render.py:183).

nvdiffrast 'linear' filter semantics: UV in [0,1] maps to texel centers at
(u*W - 0.5, v*H - 0.5); edge clamped.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["texture_bilinear"]


def texture_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample ``tex`` (H, W, C) at ``uv`` (..., 2) with bilinear filtering."""
    H, W = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def at(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        return tex[yi, xi]

    t00 = at(x0, y0)
    t10 = at(x0 + 1, y0)
    t01 = at(x0, y0 + 1)
    t11 = at(x0 + 1, y0 + 1)
    return (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )
