"""Modular Pallas rasterizer — compatibility surface over pallas_core.

Round 1 kept a standalone tile-binned forward kernel here with the dense XLA
backward; both are superseded by the fused kernels in
:mod:`largesteps_tpu.render.pallas_core` (band-skipped forward, analytic
Pallas backward).  This module keeps the modular nvdiffrast-shaped API
(``rasterize`` semantics: (u, v, z/w, tri_id+1) per pixel, SURVEY N1) for
callers that want rasterization without the fused interpolate/antialias
pipeline — benchmarks, tests and API parity with the reference's
``dr.rasterize`` (scripts/render.py:206).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_core import (
    TILE_H, TILE_W, _setup_and_bin, raster_fwd_pallas, raster_bwd_pallas,
    _chain_planes, _scatter_to_vertices, check_bin_overflow, suggest_cap,
)

__all__ = ["rasterize_pallas", "rasterize_pallas_fwd", "bin_triangles",
           "check_bin_overflow", "suggest_cap"]


def bin_triangles(*args, **kwargs):
    from . import pallas_core
    return pallas_core.bin_triangles(*args, **kwargs)


@partial(jax.jit, static_argnames=("resolution", "cap", "chunk"))
def rasterize_pallas_fwd(v_clip, faces, resolution, cap=768, chunk=8):
    """Forward-only rasterize: v_clip (C, V, 4) × faces (F, 3) →
    rast (C, H, W, 4) with channels (u, v, z/w, tri_id+1)."""
    fj = jnp.asarray(faces)
    height, width = resolution
    dummy_attrs = jnp.zeros((v_clip.shape[1], 3), v_clip.dtype)
    dummy_opp = jnp.zeros_like(fj)
    rfb, _, _, counts = _setup_and_bin(v_clip, fj, dummy_attrs, dummy_opp,
                                       height, width, cap)
    u, v, z, fid, _, _, _, _ = raster_fwd_pallas(rfb, counts, resolution,
                                                 cap, chunk)
    return jnp.stack([u, v, z, fid], axis=-1)


def rasterize_pallas(v_clip, faces, resolution, cap=768, chunk=8):
    """Differentiable modular rasterize: Pallas forward + Pallas analytic
    backward (gradients w.r.t. v_clip through the (u, v) channels)."""
    faces_np = np.asarray(faces, np.int32)
    fj = jnp.asarray(faces_np)
    height, width = resolution
    dummy_opp = np.zeros_like(faces_np)

    @jax.custom_vjp
    def _op(vc):
        out, _ = _fwd(vc)
        return out

    def _fwd(vc):
        dummy_attrs = jnp.zeros((vc.shape[1], 3), vc.dtype)
        rfb, rbb, bins, counts = _setup_and_bin(
            vc, fj, dummy_attrs, jnp.asarray(dummy_opp), height, width, cap)
        u, v, z, fid, slot, _, _, _ = raster_fwd_pallas(
            rfb, counts, resolution, cap, chunk)
        rast = jnp.stack([u, v, z, fid], axis=-1)
        return rast, (rbb, bins, counts, slot, vc.shape[1])

    def _bwd(res, g):
        rbb, bins, counts, slot, n_verts = res
        zero_col = jnp.zeros((*slot.shape, 3), jnp.float32)
        dslot = raster_bwd_pallas(rbb, counts, slot, zero_col,
                                  g[..., 0], g[..., 1], resolution, cap,
                                  chunk)
        t21 = _chain_planes(dslot, None, 0.0, rbb)
        dclip = jnp.stack(
            [jnp.stack([t21[..., 7 * k + c] for c in range(4)], axis=-1)
             for k in range(3)], axis=-2)                  # (..., cap, 3, 4)
        dA = jnp.zeros((*dslot.shape[:-1], 3, 3))
        dv_clip, _ = _scatter_to_vertices(dclip, dA, bins, fj, n_verts)
        return (dv_clip,)

    _op.defvjp(_fwd, _bwd)
    return _op(v_clip)
