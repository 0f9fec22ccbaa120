"""Differentiable triangle rasterization (the ``dr.rasterize`` +
``dr.interpolate`` equivalents of nvdiffrast, reimplemented TPU-native).

Semantics spec (N1 in SURVEY §2.2): nvdiffrast's rasterize outputs, per
pixel, ``(u, v, z/w, triangle_id + 1)`` with 0 = background, where (u, v)
are perspective-correct barycentric weights of the triangle's first two
vertices; ``interpolate`` computes ``u·A₀ + v·A₁ + (1−u−v)·A₂``; the
backward pass routes ∂L/∂(u,v) to clip-space vertex positions analytically
(used at scripts/render.py:206,213,219).

TPU design:
  * pixel-center convention: pixel (row i, col j) sits at NDC
    x = 2(j+½)/W − 1, y = 2(i+½)/H − 1 with row 0 at the **bottom**
    (OpenGL/nvdiffrast orientation);
  * forward: z-buffered reduction over triangle chunks (``lax.scan`` with a
    running (depth, u, v, id) buffer — memory-bounded, static shapes).  A
    Pallas tile-binned kernel (pallas_raster.py) implements the same
    contract for the hot path;
  * backward: per-covered-pixel closed-form recompute of (u, v) from the
    owning triangle's clip coordinates, differentiated with ``jax.vjp`` and
    scatter-added (segment_sum) into vertex gradients — exactly nvdiffrast's
    analytic position gradient, without hand-deriving the chain rule;
  * no data-dependent control flow: coverage and z-test are masked selects.

Triangles with any vertex at w ≤ 0 are discarded (no near-plane clipping —
the reference scenes keep geometry well inside the frustum).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["rasterize", "interpolate", "pixel_grid"]

_BIG_DEPTH = jnp.float32(3.4e38)


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """NDC coordinates of pixel centers: returns (px, py) of shape (H, W)."""
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=dtype) + 0.5) / height * 2.0 - 1.0
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))
    return px, py


def _edge(ax, ay, bx, by, px, py):
    """Signed edge function: cross(b − a, p − a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _pixel_uv_depth(tri_clip, px, py):
    """Barycentrics/depth of one pixel against one triangle.

    tri_clip: (3, 4) clip coords; px, py: scalars.  Returns
    (u, v, depth, covered) — this closed form is both the forward math and
    (via jax.vjp) the analytic backward.
    """
    w = tri_clip[:, 3]
    sx = tri_clip[:, 0] / w
    sy = tri_clip[:, 1] / w
    zw = tri_clip[:, 2] / w

    area = _edge(sx[0], sy[0], sx[1], sy[1], sx[2], sy[2])
    e0 = _edge(sx[1], sy[1], sx[2], sy[2], px, py)   # opposite v0
    e1 = _edge(sx[2], sy[2], sx[0], sy[0], px, py)   # opposite v1
    safe_area = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    b0 = e0 / safe_area
    b1 = e1 / safe_area
    b2 = 1.0 - b0 - b1

    covered = (
        (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)
        & (jnp.abs(area) >= 1e-12)
        & jnp.all(w > 1e-9)
    )

    # perspective-correct barycentrics
    q0, q1, q2 = b0 / w[0], b1 / w[1], b2 / w[2]
    s = q0 + q1 + q2
    safe_s = jnp.where(s == 0, 1.0, s)
    u = q0 / safe_s
    v = q1 / safe_s
    depth = b0 * zw[0] + b1 * zw[1] + b2 * zw[2]
    return u, v, depth, covered


def _raster_chunk(tri_clip, tri_ids, px, py):
    """Rasterize a chunk of triangles against the full image.

    tri_clip: (K, 3, 4), tri_ids: (K,) int32 (1-based), px/py: (H, W).
    Returns the per-pixel winner among the chunk: (depth, u, v, id).
    """
    def per_tri(tc):
        return _pixel_uv_depth(tc, px, py)

    u, v, depth, covered = jax.vmap(per_tri)(tri_clip)     # each (K, H, W)
    depth = jnp.where(covered, depth, _BIG_DEPTH)
    best = jnp.argmin(depth, axis=0)                        # (H, W)
    take = lambda arr: jnp.take_along_axis(arr, best[None], axis=0)[0]
    d_best = take(depth)
    u_best = take(u)
    v_best = take(v)
    id_best = jnp.where(d_best < _BIG_DEPTH, tri_ids[best], 0)
    return d_best, u_best, v_best, id_best


def _rasterize_fwd_impl(v_clip, faces, height: int, width: int, chunk: int):
    """Z-buffer forward for one camera: v_clip (V, 4), faces (F, 3)."""
    F = faces.shape[0]
    px, py = pixel_grid(height, width, v_clip.dtype)

    pad = (-F) % chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0) if pad else faces
    ids_p = jnp.concatenate(
        [jnp.arange(1, F + 1, dtype=jnp.int32),
         jnp.zeros((pad,), jnp.int32)]) if pad else jnp.arange(1, F + 1, dtype=jnp.int32)
    n_chunks = faces_p.shape[0] // chunk
    faces_c = faces_p.reshape(n_chunks, chunk, 3)
    ids_c = ids_p.reshape(n_chunks, chunk)

    init = (
        jnp.full((height, width), _BIG_DEPTH, v_clip.dtype),
        jnp.zeros((height, width), v_clip.dtype),
        jnp.zeros((height, width), v_clip.dtype),
        jnp.zeros((height, width), jnp.int32),
    )

    def body(carry, inputs):
        fchunk, idchunk = inputs
        tri_clip = v_clip[fchunk]                      # (chunk, 3, 4)
        d, u, v, tid = _raster_chunk(tri_clip, idchunk, px, py)
        # padded entries carry id 0 (degenerate face (0,0,0) → never covered)
        d = jnp.where(tid > 0, d, _BIG_DEPTH)
        cd, cu, cv, cid = carry
        closer = d < cd
        carry = (
            jnp.where(closer, d, cd),
            jnp.where(closer, u, cu),
            jnp.where(closer, v, cv),
            jnp.where(closer, tid, cid),
        )
        return carry, None

    (d, u, v, tid), _ = jax.lax.scan(body, init, (faces_c, ids_c))
    depth_out = jnp.where(tid > 0, d, 0.0)
    return jnp.stack([u, v, depth_out, tid.astype(v_clip.dtype)], axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rasterize(v_clip, faces, resolution, chunk=128):
    """Rasterize: v_clip (C, V, 4) × faces (F, 3) → rast (C, H, W, 4).

    Output channels: (u, v, z/w, tri_id+1); tri_id channel is 0 for
    background.  Differentiable w.r.t. ``v_clip`` through (u, v) only,
    matching nvdiffrast.
    """
    height, width = resolution
    f = jnp.asarray(faces)
    return jax.vmap(lambda vc: _rasterize_fwd_impl(vc, f, height, width, chunk))(v_clip)


def _rasterize_vjp_fwd(v_clip, faces, resolution, chunk=128):
    rast = rasterize(v_clip, faces, resolution, chunk)
    return rast, (v_clip, jnp.asarray(faces), rast)


def _rasterize_vjp_bwd(resolution, chunk, res, g):
    v_clip, faces, rast = res
    height, width = resolution
    C, V = v_clip.shape[0], v_clip.shape[1]
    px, py = pixel_grid(height, width, v_clip.dtype)

    tri_id = rast[..., 3].astype(jnp.int32)            # (C, H, W)
    covered = tri_id > 0
    fidx = faces[jnp.maximum(tri_id - 1, 0)]           # (C, H, W, 3)

    def per_cam(vc, fi, cov, gu, gv):
        tri_clip = vc[fi]                              # (H, W, 3, 4)

        def pixel_fn(tc, x, y):
            u, v, _, _ = _pixel_uv_depth(tc, x, y)
            return u, v

        def pixel_vjp(tc, x, y, du, dv):
            _, vjp = jax.vjp(lambda t: pixel_fn(t, x, y), tc)
            (dt,) = vjp((du, dv))
            return dt                                   # (3, 4)

        du = jnp.where(cov, gu, 0.0)
        dv = jnp.where(cov, gv, 0.0)
        dt = jax.vmap(jax.vmap(pixel_vjp))(tri_clip, px, py, du, dv)  # (H, W, 3, 4)
        dt = jnp.where(cov[..., None, None], dt, 0.0)
        flat_ids = fi.reshape(-1)                      # (H*W*3,)
        flat_dt = dt.reshape(-1, 4)
        return jax.ops.segment_sum(flat_dt, flat_ids, num_segments=V)

    dvc = jax.vmap(per_cam)(v_clip, fidx, covered, g[..., 0], g[..., 1])
    return dvc, None


rasterize.defvjp(_rasterize_vjp_fwd, _rasterize_vjp_bwd)


def interpolate(attr, rast, faces):
    """Barycentric attribute interpolation (nvdiffrast ``dr.interpolate``).

    attr: (V, D) or (C, V, D); rast: (C, H, W, 4); faces: (F, 3).
    Returns (C, H, W, D), zero on background.  Fully differentiable (autodiff
    produces the scatter-add attribute backward); (u, v) gradients chain into
    :func:`rasterize`'s position backward.
    """
    faces = jnp.asarray(faces)
    tri_id = jax.lax.stop_gradient(rast[..., 3]).astype(jnp.int32)
    covered = tri_id > 0
    fidx = faces[jnp.maximum(tri_id - 1, 0)]           # (C, H, W, 3)
    u = rast[..., 0:1]
    v = rast[..., 1:2]

    if attr.ndim == 2:
        a = attr[fidx]                                  # (C, H, W, 3, D)
    else:
        a = jax.vmap(lambda av, fv: av[fv])(attr, fidx)
    out = u * a[..., 0, :] + v * a[..., 1, :] + (1.0 - u - v) * a[..., 2, :]
    return jnp.where(covered[..., None], out, 0.0)
