"""Pallas TPU rasterization kernel: tile-binned z-buffered forward pass.

Same contract as raster.rasterize (nvdiffrast semantics: per-pixel
(u, v, z/w, tri_id+1)), designed for the TPU memory hierarchy:

  * **Binning pre-pass (XLA):** per-triangle screen bounding boxes are
    tested against image tiles; each tile's overlapping triangle indices are
    compacted into a fixed-capacity bin (static shapes; argsort-based
    compaction).  The far majority of (tile, triangle) pairs die here, so
    kernel work drops from O(F·H·W) to O(Σ_tile bin_count·tile_pixels).
  * **Kernel (Pallas):** grid = (cameras, tile_rows, tile_cols).  Each
    program loads its bin's packed triangle records (CAP×16 f32, one VMEM
    block) and loops over them in chunks, evaluating edge functions for all
    tile pixels on the VPU against a (tile_h, tile_w) z-buffer carried in
    registers/VMEM.  No HBM traffic inside the loop; outputs stream once.
  * The backward pass reuses the analytic XLA path in raster.py (gather +
    segment_sum), which is bandwidth-light compared to the forward.

Bin overflow policy: capacity is a static parameter; overflowing triangles
beyond CAP are dropped deterministically (earliest ids kept).  Use
``suggest_bin_capacity``/``check_bin_overflow`` at epoch boundaries to size
CAP; overflow never corrupts memory, it only under-draws the affected tile.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rasterize_pallas", "bin_triangles", "check_bin_overflow"]

_BIG = 3.4e38  # Python float: jnp scalars would be captured consts in the kernel


def _triangle_setup(v_clip, faces):
    """Per-triangle packed records (F, 16) f32 for one camera:
    [sx0, sy0, sx1, sy1, sx2, sy2, zw0, zw1, zw2, iw0, iw1, iw2,
     valid, id+1, pad, pad] — screen coords in NDC, iw = 1/w."""
    tri = v_clip[faces]                      # (F, 3, 4)
    w = tri[..., 3]
    valid = jnp.all(w > 1e-9, axis=1)
    safe_w = jnp.where(w == 0, 1.0, w)
    iw = jnp.where(valid[:, None], 1.0 / safe_w, 0.0)
    sx = tri[..., 0] * iw
    sy = tri[..., 1] * iw
    zw = tri[..., 2] * iw
    ids = jnp.arange(1, faces.shape[0] + 1, dtype=jnp.float32)
    pad = jnp.zeros_like(ids)
    rec = jnp.stack([
        sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
        zw[:, 0], zw[:, 1], zw[:, 2], iw[:, 0], iw[:, 1], iw[:, 2],
        valid.astype(jnp.float32), ids, pad, pad,
    ], axis=1)                               # (F, 16)
    return rec, sx, sy, valid


def bin_triangles(sx, sy, valid, height, width, tile_h, tile_w, cap):
    """Compact per-tile triangle index bins.

    sx/sy: (F, 3) NDC screen coords.  Returns bins (TY, TX, cap) int32
    (−1 padded) and counts (TY, TX).
    """
    ty = height // tile_h
    tx = width // tile_w
    # bbox in pixel units (pixel centers at NDC 2(j+.5)/W-1)
    px_min = (jnp.min(sx, axis=1) + 1.0) * (width / 2.0) - 0.5
    px_max = (jnp.max(sx, axis=1) + 1.0) * (width / 2.0) - 0.5
    py_min = (jnp.min(sy, axis=1) + 1.0) * (height / 2.0) - 0.5
    py_max = (jnp.max(sy, axis=1) + 1.0) * (height / 2.0) - 0.5

    tile_y0 = jnp.arange(ty, dtype=jnp.float32)[:, None, None] * tile_h
    tile_x0 = jnp.arange(tx, dtype=jnp.float32)[None, :, None] * tile_w
    overlap = (
        (px_max[None, None, :] >= tile_x0 - 0.5)
        & (px_min[None, None, :] <= tile_x0 + tile_w - 0.5)
        & (py_max[None, None, :] >= tile_y0 - 0.5)
        & (py_min[None, None, :] <= tile_y0 + tile_h - 0.5)
        & valid[None, None, :]
    )                                        # (TY, TX, F)
    counts = overlap.sum(axis=-1)
    # stable compaction: indices of True entries first, ascending id
    F = sx.shape[0]
    order = jnp.argsort(~overlap, axis=-1, stable=True)   # True first
    bins = order[..., :cap].astype(jnp.int32)
    k = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 2)
    bins = jnp.where(k < jnp.minimum(counts, cap)[..., None], bins, -1)
    return bins, counts


def check_bin_overflow(v_clip, faces, resolution, tile=(32, 128), cap=512):
    """Host-callable diagnostic: max bin occupancy over all cameras/tiles."""
    height, width = resolution
    faces = jnp.asarray(faces)

    def per_cam(vc):
        _, sx, sy, valid = _triangle_setup(vc, faces)
        _, counts = bin_triangles(sx, sy, valid, height, width, *tile, cap)
        return counts.max()

    return int(jax.vmap(per_cam)(v_clip).max())


def _raster_kernel(counts_ref, rec_ref, u_ref, v_ref, z_ref, id_ref,
                   *, tile_h, tile_w, cap, height, width, chunk):
    ci = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    count = counts_ref[ci, ti, tj]          # actual bin occupancy (prefetched)

    # NDC coordinates of this tile's pixels
    # TPU iota must be integer-typed; cast to f32 after
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    py = ((ti * tile_h).astype(jnp.float32) + row + 0.5) * (2.0 / height) - 1.0
    px = ((tj * tile_w).astype(jnp.float32) + col + 0.5) * (2.0 / width) - 1.0

    def chunk_body(c, carry):
        rec = rec_ref[0, 0, 0, pl.ds(c * chunk, chunk), :]   # (chunk, 16)

        # statically unrolled over the chunk: dynamic indexing of VALUES is
        # not lowerable on TPU, static row extraction is
        def tri_body(k, carry2):
            depth, uu, vv, tid = carry2
            r = rec[k]                                        # static index
            sx0, sy0, sx1, sy1, sx2, sy2 = r[0], r[1], r[2], r[3], r[4], r[5]
            zw0, zw1, zw2 = r[6], r[7], r[8]
            iw0, iw1, iw2 = r[9], r[10], r[11]
            valid = r[12] > 0.0
            fid = r[13]

            area = (sx1 - sx0) * (sy2 - sy0) - (sy1 - sy0) * (sx2 - sx0)
            inv_area = jnp.where(jnp.abs(area) < 1e-12, 0.0, 1.0 / jnp.where(area == 0, 1.0, area))
            e0 = (sx2 - sx1) * (py - sy1) - (sy2 - sy1) * (px - sx1)
            e1 = (sx0 - sx2) * (py - sy2) - (sy0 - sy2) * (px - sx2)
            b0 = e0 * inv_area
            b1 = e1 * inv_area
            b2 = 1.0 - b0 - b1
            covered = (
                (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)
                & (inv_area != 0.0) & valid
            )
            d = b0 * zw0 + b1 * zw1 + b2 * zw2
            d = jnp.where(covered, d, _BIG)
            closer = d < depth
            q0 = b0 * iw0
            q1 = b1 * iw1
            s = q0 + q1 + b2 * iw2
            inv_s = jnp.where(s == 0, 0.0, 1.0 / jnp.where(s == 0, 1.0, s))
            new_u = q0 * inv_s
            new_v = q1 * inv_s
            return (
                jnp.where(closer, d, depth),
                jnp.where(closer, new_u, uu),
                jnp.where(closer, new_v, vv),
                jnp.where(closer, fid, tid),
            )

        for k in range(chunk):
            carry = tri_body(k, carry)
        return carry

    init = (
        jnp.full((tile_h, tile_w), _BIG, jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
    )
    # only walk the filled part of the bin (padding rows are never touched)
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, cap // chunk)
    depth, uu, vv, tid = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    covered = tid > 0.0
    u_ref[0] = jnp.where(covered, uu, 0.0)
    v_ref[0] = jnp.where(covered, vv, 0.0)
    z_ref[0] = jnp.where(covered, depth, 0.0)
    id_ref[0] = tid


def _use_interpret() -> bool:
    """Pallas TPU kernels only compile on TPU; interpret elsewhere (tests)."""
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("resolution", "tile", "cap", "chunk", "interpret"))
def rasterize_pallas_fwd(v_clip, faces, resolution, tile=(32, 128), cap=512,
                         chunk=8, interpret=None):
    """Forward rasterization via the Pallas kernel.

    v_clip (C, V, 4), faces (F, 3) → rast (C, H, W, 4).  H, W must be
    multiples of the tile shape; cap a multiple of chunk.
    """
    height, width = resolution
    tile_h, tile_w = tile
    assert height % tile_h == 0 and width % tile_w == 0, (resolution, tile)
    assert cap % chunk == 0
    if interpret is None:
        interpret = _use_interpret()
    faces = jnp.asarray(faces)
    C = v_clip.shape[0]
    ty, tx = height // tile_h, width // tile_w

    def per_cam(vc):
        rec, sx, sy, valid = _triangle_setup(vc, faces)
        bins, counts = bin_triangles(sx, sy, valid, height, width, tile_h, tile_w, cap)
        # gather packed records per bin entry; -1 → zero record (invalid)
        safe = jnp.maximum(bins, 0)
        rec_b = rec[safe]                                     # (TY, TX, cap, 16)
        rec_b = jnp.where((bins >= 0)[..., None], rec_b, 0.0)
        return rec_b, jnp.minimum(counts, cap).astype(jnp.int32)

    rec_b, counts_b = jax.vmap(per_cam)(v_clip)               # (C, TY, TX, cap, 16)

    kernel = partial(_raster_kernel, tile_h=tile_h, tile_w=tile_w, cap=cap,
                     height=height, width=width, chunk=chunk)
    out_shape = [jax.ShapeDtypeStruct((C, height, width), jnp.float32)] * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,              # per-tile occupancy counts
        grid=(C, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 1, 1, cap, 16),
                         lambda c, i, j, counts: (c, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w),
                         lambda c, i, j, counts: (c, i, j),
                         memory_space=pltpu.VMEM)
        ] * 4,
    )
    u, v, z, tid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts_b, rec_b)
    return jnp.stack([u, v, z, tid], axis=-1)


def rasterize_pallas(v_clip, faces, resolution, tile=(32, 128), cap=512,
                     chunk=8):
    """Differentiable Pallas rasterize: Pallas forward + analytic XLA
    backward (shared with raster.rasterize)."""
    from .raster import rasterize as _ref_rasterize  # noqa: F401  (API parity)
    import largesteps_tpu.render.raster as _r

    @jax.custom_vjp
    def _op(vc):
        return rasterize_pallas_fwd(vc, faces, resolution, tile, cap, chunk)

    def _fwd(vc):
        rast = rasterize_pallas_fwd(vc, faces, resolution, tile, cap, chunk)
        return rast, (vc, rast)

    def _bwd(res, g):
        vc, rast = res
        dvc, _ = _r._rasterize_vjp_bwd(resolution, None, (vc, jnp.asarray(faces), rast), g)
        return (dvc,)

    _op.defvjp(_fwd, _bwd)
    return _op(v_clip)
