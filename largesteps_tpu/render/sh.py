"""Order-2 spherical-harmonics irradiance environment lighting.

Reference semantics: scripts/render.py:5-87 — the Ramamoorthi–Hanrahan 2001
9-coefficient irradiance approximation of an equirectangular envmap,
assembled into a 4×4 quadratic form per color channel so per-vertex shading
is ``l = hᵀ M h`` with homogeneous normals ``h = [n, 1]``.

Angular conventions replicated exactly (they pair with the background UV
convention, SURVEY §7 "known quirks"): θ = linspace(0, π) over rows,
φ = linspace(3π, π) over columns, Y-up remap
x = sinθ cosφ, z = −sinθ sinφ, y = cosθ, measure dθdφ = 2π²/(WH)·sinθ.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["sh_matrices", "sh_eval", "SphericalHarmonics"]


def sh_matrices(envmap: jax.Array) -> jax.Array:
    """Precompute the (3, 4, 4) RGB quadratic-form matrices from an
    equirectangular envmap (H, W, ≥3).  Runs once per scene."""
    envmap = jnp.asarray(envmap)
    h, w = envmap.shape[:2]
    theta = jnp.linspace(0.0, np.pi, h)[:, None] * jnp.ones((1, w))
    phi = jnp.ones((h, 1)) * jnp.linspace(3 * np.pi, np.pi, w)[None, :]

    sin_theta = jnp.sin(theta)
    x = sin_theta * jnp.cos(phi)
    z = -sin_theta * jnp.sin(phi)
    y = jnp.cos(theta)

    Y0 = 0.282095 * jnp.ones_like(x)
    # indexed so that Y1[p] / Y2[p] give the proper degree-1/2 polynomials
    Y1 = {-1: 0.488603 * z, 0: 0.488603 * x, 1: 0.488603 * y}
    Y2 = {
        0: 0.315392 * (3 * z * z - 1),
        1: 1.092548 * x * z,
        2: 0.546274 * (x * x - y * y),
        -2: 1.092548 * x * y,
        -1: 1.092548 * y * z,
    }

    radiance = envmap[..., :3]
    dt_dp = 2.0 * np.pi**2 / (w * h)
    st = sin_theta[..., None]

    def integ(Y):
        return (radiance * (Y[..., None]) * st * dt_dp).sum(axis=(0, 1))

    L0 = {0: integ(Y0)}
    L1 = {p: integ(Y1[p]) for p in (-1, 0, 1)}
    L2 = {p: integ(Y2[p]) for p in (-2, -1, 0, 1, 2)}

    c1, c2, c3, c4, c5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708
    M = jnp.stack(
        [
            jnp.stack([c1 * L2[2], c1 * L2[-2], c1 * L2[1], c2 * L1[1]]),
            jnp.stack([c1 * L2[-2], -c1 * L2[2], c1 * L2[-1], c2 * L1[-1]]),
            jnp.stack([c1 * L2[1], c1 * L2[-1], c3 * L2[0], c2 * L1[0]]),
            jnp.stack([c2 * L1[1], c2 * L1[-1], c2 * L1[0], c4 * L0[0] - c5 * L2[0]]),
        ]
    )  # (4, 4, 3)
    return jnp.moveaxis(M, 2, 0)  # (3, 4, 4)


def sh_eval(M: jax.Array, n: jax.Array) -> jax.Array:
    """Evaluate irradiance at normals ``n`` (..., 3) → (..., 3) RGB.

    ``l_c = hᵀ M_c h`` with h = [n, 1] (render.py:75-87).  One small batched
    matmul — MXU-friendly for large V.
    """
    shape = n.shape
    h = jnp.concatenate(
        [n.reshape(-1, 3), jnp.ones((int(np.prod(shape[:-1])), 1), n.dtype)], axis=1
    )
    Mh = jnp.einsum("cij,vj->cvi", M, h)          # (3, V, 4)
    l = jnp.einsum("vi,cvi->vc", h, Mh)           # (V, 3)
    return l.reshape(*shape[:-1], 3)


class SphericalHarmonics:
    """Object wrapper mirroring the reference surface (render.py:13-87)."""

    def __init__(self, envmap):
        self.M = sh_matrices(envmap)

    def eval(self, n):
        return sh_eval(self.M, n)
