"""Fused Pallas TPU rasterization core: tile-binned forward
(rasterize + attribute interpolation) and analytic backward kernels.

This replaces the round-1 split pipeline (Pallas forward, dense per-pixel
``jax.vjp`` XLA backward, XLA gather-based interpolate) whose cost was
dominated by XLA's scalar-rate gathers/scatters.  Reference semantics are
nvdiffrast's rasterize/interpolate pair (SURVEY §2.2 N1; used at
scripts/render.py:206,213,219): per-pixel perspective-correct barycentrics
(u, v), depth z/w, 1-based triangle id, and attribute interpolation
``u·A₀ + v·A₁ + (1−u−v)·A₂`` with analytic gradients to clip-space vertex
positions and to the attributes.

TPU design
----------
* **Per-triangle setup (XLA, elementwise):** every per-pixel quantity the
  kernel needs is an affine function of the pixel's NDC coordinates, so the
  setup precomputes affine coefficients per triangle:
  ``q0 = b0·iw0 = q0a·px + q0b·py + q0c`` (likewise q1, the perspective
  denominator s = Σqᵢ, and depth), making the kernel's inner loop pure FMAs.
* **Binning (XLA):** per (camera, tile) fixed-capacity triangle bins from a
  1-pixel-expanded bbox/tile overlap test (the expansion lets the same bins
  serve the antialias kernels, whose pair owners may sit one pixel outside
  the tile).  Stable argsort compaction — measured faster on-chip than
  scatter-based fills at suzanne scale.
* **Lane layout:** per-pixel math runs in a (1, P) layout with all P =
  TILE_H·TILE_W tile pixels on the lane axis (p = row·W + col); an 8-row
  band is then a contiguous 1024-lane slice.  This keeps every op a fat
  vector op — round 2's kernels extracted per-triangle scalars from VMEM
  rows (~55 ns each on this chip), which dominated their runtime.
* **Forward kernel:** grid (camera, tile_y, tile_x); the z-loop processes
  triangle chunks *vectorized over the chunk (sublane) axis* — affine
  evaluation is a (chunk, band) broadcast FMA, the winner is selected by a
  (depth, face-id)-lexicographic reduction (order-independent, equal to
  the oracle's ascending-id scan with a strict z-test), and chunk-level
  bbox tests skip bands (bins are ymin-sorted so chunks stay y-coherent).
  Only (depth, fid, slot) live in the loop; u/v/color are reconstructed
  after it from a one-hot gather of the winner's record.
* **One-hot MXU gathers/reductions:** per-pixel owner records
  (``rec[slot_plane]``) and per-slot gradient sums are both expressed as
  chunked one-hot matmuls — the TPU-idiomatic replacement for CUDA's
  per-pixel gather and atomic scatter.  The gather and reduction must
  build their one-hots from *syntactically different* compare expressions
  (see _onehot_gather) — Mosaic crashes when one one-hot value feeds dots
  of both contraction orientations.
* **Backward kernel:** (A) owner fields via one-hot gather; (B) one dense
  per-pixel pass computes the 18 analytic gradient fields (d sx/sy per
  vertex, d iw per vertex, d attr per vertex·channel); (C) per-slot sums
  via one-hot reduction.  Per-slot sums are chained to clip-space
  gradients and segment-summed to vertices in XLA.

The modular ops (raster.rasterize / raster.interpolate) remain the semantic
oracle; tests compare this kernel against them in interpret mode on CPU.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "triangle_setup", "bin_triangles", "raster_fwd_pallas",
    "raster_bwd_pallas", "render_core", "make_render_core",
    "make_render_pipeline", "suggest_cap", "check_bin_overflow",
]

_BIG = 3.4e38
TILE_H = 32
TILE_W = 128
_BANDS = TILE_H // 8
_P = TILE_H * TILE_W          # pixels per tile, laid out on the lane axis
_BAND_P = 8 * TILE_W          # pixels per 8-row band (one lane-slice)
_OH = 128                     # one-hot matmul chunk along the slot axis

# rec_fwd layout (F, 32) f32 — everything the forward z-loop needs:
#   0..2   q0a q0b q0c     q0 = b0*iw0 = q0a*px + q0b*py + q0c
#   3..5   q1a q1b q1c
#   6..8   sa  sb  sc      s = q0 + q1 + q2 (perspective denominator)
#   9..11  da  db  dc      depth z/w = da*px + db*py + dc
#   12     ymin_px  13 ymax_px   (bbox pixel-row range, 1px expanded)
#   14     fid (1-based, f32)
#   15     pad
#   16..24 P0 Q0 R0 P1 Q1 R1 P2 Q2 R2   color_c = u*Pc + v*Qc + Rc
#   25..31 pad
#
# rec_bwd layout (F, 32) f32 — everything backward + antialias need:
#   0..2   b0a b0b b0c     b0 = screen barycentric (affine in px,py)
#   3..5   b1a b1b b1c
#   6..8   iw0 iw1 iw2
#   9..14  sx0 sy0 sx1 sy1 sx2 sy2
#   15     inv_area
#   16..21 P0 Q0 P1 Q1 P2 Q2   (attr diffs: Pc = A0c-A2c, Qc = A1c-A2c)
#   22     fid (1-based)
#   23..25 opp0 opp1 opp2  (1-based adjacent-face id per edge, 0 = boundary)
#   26     ymin_px  27 ymax_px
#   28..31 pad


def triangle_setup(v_clip, faces, attrs, opp, height, width):
    """Per-triangle setup for one camera.

    v_clip (V, 4), faces (F, 3) int32, attrs (V, 3), opp (F, 3) int32.
    Returns (rec_fwd (F, 32), rec_bwd (F, 32)).  Pure elementwise XLA —
    one gather of the 3 vertex rows per triangle.
    """
    F = faces.shape[0]
    fid = jnp.arange(1, F + 1, dtype=jnp.float32)
    opp1 = (jnp.asarray(opp) + 1).astype(jnp.float32)   # 0 = boundary
    return _setup_core(v_clip[faces], attrs[faces], opp1, fid, height, width)


def _setup_core(tri, A, opp1, fid, height, width):
    """Record assembly from pre-gathered corners: tri (N, 3, 4) clip-space
    corner positions, A (N, 3, 3) corner attrs, opp1 (N, 3) 1-based
    adjacent-face ids (0 = boundary), fid (N,) 1-based face id (0 = dead
    slot — rigged to an empty y-range and zero coverage)."""
    w = tri[..., 3]
    valid = jnp.all(w > 1e-9, axis=1) & (fid > 0.0)
    safe_w = jnp.where(w == 0, 1.0, w)
    iw = jnp.where(valid[:, None], 1.0 / safe_w, 0.0)
    # direct division (not x * (1/w)): rounds identically to the antialias
    # oracle's screen coordinates, so edge-crossing parameters match exactly
    ok = valid[:, None]
    sx = jnp.where(ok, tri[..., 0] / safe_w, 0.0)
    sy = jnp.where(ok, tri[..., 1] / safe_w, 0.0)
    zw = jnp.where(ok, tri[..., 2] / safe_w, 0.0)

    area = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) \
        - (sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0])
    valid = valid & (jnp.abs(area) >= 1e-12)
    inv_area = jnp.where(valid, 1.0 / jnp.where(area == 0, 1.0, area), 0.0)

    # b0 = e0/area affine coefficients; e0 = cross(p2-p1, p-p1)
    b0a = -(sy[:, 2] - sy[:, 1]) * inv_area
    b0b = (sx[:, 2] - sx[:, 1]) * inv_area
    b0c = (sx[:, 1] * (sy[:, 2] - sy[:, 1])
           - sy[:, 1] * (sx[:, 2] - sx[:, 1])) * inv_area
    # b1 = e1/area; e1 = cross(p0-p2, p-p2)
    b1a = -(sy[:, 0] - sy[:, 2]) * inv_area
    b1b = (sx[:, 0] - sx[:, 2]) * inv_area
    b1c = (sx[:, 2] * (sy[:, 0] - sy[:, 2])
           - sy[:, 2] * (sx[:, 0] - sx[:, 2])) * inv_area

    q0a, q0b = b0a * iw[:, 0], b0b * iw[:, 0]
    q1a, q1b = b1a * iw[:, 1], b1b * iw[:, 1]
    # invalid triangles: q0 == -1 everywhere -> never covered
    q0c = jnp.where(valid, b0c * iw[:, 0], -1.0)
    q1c = jnp.where(valid, b1c * iw[:, 1], -1.0)
    d02, d12 = iw[:, 0] - iw[:, 2], iw[:, 1] - iw[:, 2]
    sa = b0a * d02 + b1a * d12
    sb = b0b * d02 + b1b * d12
    sc = b0c * d02 + b1c * d12 + iw[:, 2]
    z02, z12 = zw[:, 0] - zw[:, 2], zw[:, 1] - zw[:, 2]
    da = b0a * z02 + b1a * z12
    db = b0b * z02 + b1b * z12
    dc = b0c * z02 + b1c * z12 + zw[:, 2]

    # bbox in pixel-row/col units, 1px expanded (shared with antialias)
    ymin = (jnp.min(sy, axis=1) + 1.0) * (height / 2.0) - 0.5 - 1.0
    ymax = (jnp.max(sy, axis=1) + 1.0) * (height / 2.0) - 0.5 + 1.0
    ymin = jnp.where(valid, ymin, 1e9)
    ymax = jnp.where(valid, ymax, -1e9)

    P = A[:, 0] - A[:, 2]                     # (N, 3)
    Q = A[:, 1] - A[:, 2]
    R = A[:, 2]
    pad = jnp.zeros_like(fid)

    rec_fwd = jnp.stack([
        q0a, q0b, q0c, q1a, q1b, q1c, sa, sb, sc, da, db, dc,
        ymin, ymax, fid, pad,
        P[:, 0], Q[:, 0], R[:, 0], P[:, 1], Q[:, 1], R[:, 1],
        P[:, 2], Q[:, 2], R[:, 2],
        pad, pad, pad, pad, pad, pad, pad,
    ], axis=1)

    rec_bwd = jnp.stack([
        b0a, b0b, b0c, b1a, b1b, b1c,
        iw[:, 0], iw[:, 1], iw[:, 2],
        sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
        inv_area,
        P[:, 0], Q[:, 0], P[:, 1], Q[:, 1], P[:, 2], Q[:, 2],
        fid, opp1[:, 0], opp1[:, 1], opp1[:, 2],
        ymin, ymax,
        pad, pad, pad, pad,
    ], axis=1)
    return rec_fwd, rec_bwd


def bin_triangles(rec_fwd, v_clip, faces, height, width, cap,
                  ty_range=None):
    """Fixed-capacity per-tile triangle bins for one camera.

    Overlap test uses the 1px-expanded bbox so the antialias kernels can
    find pair owners that sit just across a tile border.  Returns
    (bins (T, cap) int32 with -1 padding, counts (T,)) where
    T = (height//TILE_H) * (width//TILE_W).

    ``ty_range`` — optional (row0_tiles, ty_local): bin only the
    ``ty_local`` tile rows starting at traced tile-row ``row0_tiles``
    (the 'sp' image-row sharding path; each device bins its own rows).
    """
    ty, tx = height // TILE_H, width // TILE_W
    row0_tiles = 0
    if ty_range is not None:
        row0_tiles, ty = ty_range
    tri = v_clip[faces]
    w = tri[..., 3]
    safe_w = jnp.where(w == 0, 1.0, w)
    iw = 1.0 / safe_w
    sx = tri[..., 0] * iw
    sy = tri[..., 1] * iw
    xmin = (jnp.min(sx, axis=1) + 1.0) * (width / 2.0) - 0.5 - 1.0
    xmax = (jnp.max(sx, axis=1) + 1.0) * (width / 2.0) - 0.5 + 1.0
    ymin = rec_fwd[:, 12]
    ymax = rec_fwd[:, 13]
    valid = ymax > ymin                      # invalid rigged to empty range

    ty0 = (jnp.arange(ty, dtype=jnp.float32)[:, None, None]
           + jnp.asarray(row0_tiles, jnp.float32)) * TILE_H
    tx0 = jnp.arange(tx, dtype=jnp.float32)[None, :, None] * TILE_W
    overlap = (
        (ymax[None, None, :] >= ty0) & (ymin[None, None, :] <= ty0 + TILE_H - 1)
        & (xmax[None, None, :] >= tx0) & (xmin[None, None, :] <= tx0 + TILE_W - 1)
        & valid[None, None, :]
    )                                        # (TY, TX, F)
    counts = overlap.sum(axis=-1)
    # sort each bin by ymin (ties: ascending face id via stable sort) so the
    # forward z-loop's chunk-level band skip sees y-coherent chunks; the
    # kernels' (depth, fid)-lexicographic z-test makes the result
    # order-independent, so the sort is purely a performance choice
    key = jnp.where(overlap, ymin[None, None, :], jnp.inf)
    order = jnp.argsort(key, axis=-1, stable=True)
    if order.shape[-1] < cap:
        order = jnp.pad(order, ((0, 0), (0, 0), (0, cap - order.shape[-1])))
    bins = order[..., :cap].astype(jnp.int32)
    k = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 2)
    bins = jnp.where(k < jnp.minimum(counts, cap)[..., None], bins, -1)
    return bins.reshape(ty * tx, cap), counts.reshape(ty * tx)


def setup_from_bins(v_clip, faces, attrs, opp, bins, height, width,
                    need_fwd=True):
    """Per-triangle setup + binned-record gather for one camera.

    The large-F path: build (F, 32) records in face-major order (the same
    elementwise setup as the traced path) and gather whole 32-f32 record
    ROWS by the precomputed bins.  Per-corner gathers were tried first and
    OOM HBM: a (T·cap, 3, 4) gather output tile-pads its trailing (3, 4)
    dims to (8, 128) — a 42× memory blowup at 327k faces.

    v_clip (V, 4); bins (T, cap) int32 with -1 = dead slot.  Returns
    (rfb (T, cap, 32), rbb (T, cap, 32)); ``need_fwd=False`` skips the
    forward-record gather entirely (the backward pass only needs rbb —
    saves one (T·cap, 32) gather, ~17 ms/camera at 163k verts).
    """
    T, cap = bins.shape
    rec_fwd, rec_bwd = triangle_setup(v_clip, faces, attrs, opp,
                                      height, width)
    safe = jnp.maximum(bins, 0)
    live = (bins >= 0)[..., None]
    rbb = jnp.where(live, rec_bwd[safe], 0.0)
    if not need_fwd:
        return None, rbb
    # padded slots select a constant dead row whose y-range is EMPTY so
    # they can't poison the forward kernel's chunk-level band-bbox test
    # (a zeroed row reads as y=0); one fused where, no extra .at passes
    dead_row = jnp.zeros((32,), jnp.float32).at[12].set(1e9).at[13].set(-1e9)
    rfb = jnp.where(live, rec_fwd[safe], dead_row)
    return rfb, rbb


def bin_triangles_host(v_ndc, faces, resolution, cap=None, margin=0.0,
                       chunk=8, cull=False, return_spans=False,
                       return_slots=False):
    """Host (numpy) binning for ALL cameras — the large-F regime.

    The traced overlap-matrix binning costs O(T·F) memory and T argsorts of
    F keys per camera per step; TPU sorts run at ~10 M keys/s, so at 327k
    faces one binning pass measured 22 s on chip.  On host the same
    computation is a vectorized numpy pass (~0.2 s), and because the bins
    only depend on 2-D bboxes, a ``margin``-pixel expansion keeps them
    VALID for every step in which no vertex moves more than margin/2
    pixels — the driver re-bins every few steps and passes the bins into
    the jitted step as ordinary device arguments.

    v_ndc: (C, V, 4) array (device or host).  Returns
    (bins (C, T, cap) int32 with -1 padding, counts (C, T) int32, occ).
    If ``cap`` is None it is sized from the measured occupancy
    (suggest_cap, which already adds 25% headroom).
    """
    height, width = resolution
    ty_n, tx_n = height // TILE_H, width // TILE_W
    T = ty_n * tx_n
    v_ndc = np.asarray(v_ndc)
    faces = np.asarray(faces)
    C = v_ndc.shape[0]

    # planar per-corner gathers (a (C, F, 3, 4) fancy index measured 20+ s
    # at 327k faces × 13 cameras; this form is ~20×-cheaper)
    vx = np.ascontiguousarray(v_ndc[..., 0])
    vy = np.ascontiguousarray(v_ndc[..., 1])
    vw = np.ascontiguousarray(v_ndc[..., 3])
    sx, sy, valid = [], [], True
    for c in range(3):
        idx = faces[:, c]
        w = vw[:, idx]                           # (C, F)
        valid = valid & (w > 1e-9)
        w[w == 0] = 1.0
        sx.append(vx[:, idx] / w)
        sy.append(vy[:, idx] / w)
    area = (sx[1] - sx[0]) * (sy[2] - sy[0]) \
        - (sy[1] - sy[0]) * (sx[2] - sx[0])
    if cull:
        # closed-mesh back-face cull: a back-facing triangle never wins the
        # z-test, so dropping it from the bins halves occupancy without
        # changing the image (see bin_triangles_device + the parity test).
        # Front faces have POSITIVE screen-space area under the negated-x
        # Mitsuba projection (verified by test_backface_cull_image_parity).
        valid &= area > 0.0
    else:
        valid &= np.abs(area) >= 1e-12
    exp = 1.0 + margin                           # 1px AA expansion + margin
    xmin = (np.minimum(np.minimum(sx[0], sx[1]), sx[2]) + 1.0) \
        * (width / 2.0) - 0.5 - exp
    xmax = (np.maximum(np.maximum(sx[0], sx[1]), sx[2]) + 1.0) \
        * (width / 2.0) - 0.5 + exp
    ymin = (np.minimum(np.minimum(sy[0], sy[1]), sy[2]) + 1.0) \
        * (height / 2.0) - 0.5 - exp
    ymax = (np.maximum(np.maximum(sy[0], sy[1]), sy[2]) + 1.0) \
        * (height / 2.0) - 0.5 + exp

    # tile index ranges (inclusive); mirror of the traced overlap test
    # (xmax >= tile_x0 and xmin <= tile_x0 + TILE_W - 1)
    valid &= (xmax >= 0) & (ymax >= 0) \
        & (xmin <= width - 1) & (ymin <= height - 1)
    jlo = np.clip(np.floor(xmin).astype(np.int64) // TILE_W, 0, tx_n - 1)
    jhi = np.clip(np.floor(xmax).astype(np.int64) // TILE_W, 0, tx_n - 1)
    ilo = np.clip(np.floor(ymin).astype(np.int64) // TILE_H, 0, ty_n - 1)
    ihi = np.clip(np.floor(ymax).astype(np.int64) // TILE_H, 0, ty_n - 1)

    span_y = int(np.max((ihi - ilo + 1) * valid, initial=1))
    span_x = int(np.max((jhi - jlo + 1) * valid, initial=1))

    tile_ids, face_ids, cam_ids, ent_ids = [], [], [], []
    F = faces.shape[0]
    fidx = np.broadcast_to(np.arange(F, dtype=np.int64), (C, F))
    cidx = np.broadcast_to(np.arange(C, dtype=np.int64)[:, None], (C, F))
    cell = 0
    for dy in range(span_y):
        for dx in range(span_x):
            ti = ilo + dy
            tj = jlo + dx
            m = valid & (ti <= ihi) & (tj <= jhi)
            t = ti[m] * tx_n + tj[m]
            tile_ids.append(t)
            face_ids.append(fidx[m])
            cam_ids.append(cidx[m])
            # (cam, face, span-cell) identity of each entry, kept so the
            # face→slot inverse can be scattered back after the sort
            ent_ids.append((cidx[m] * F + fidx[m]) * (span_y * span_x) + cell)
            cell += 1
    tile_id = np.concatenate(tile_ids)
    face_id = np.concatenate(face_ids)
    cam_id = np.concatenate(cam_ids)
    ent_id = np.concatenate(ent_ids)
    key = cam_id * T + tile_id
    counts = np.bincount(key, minlength=C * T).reshape(C, T)
    occ = int(counts.max(initial=0))
    if cap is None:
        cap = suggest_cap(occ, chunk)

    # order bins by ymin within each tile (like the traced binning) so the
    # forward kernel's chunk-level band skip sees y-coherent chunks; the
    # margin keeps the ordering approximately valid until the next re-bin,
    # and the kernels' (depth, fid)-lexicographic z-test makes results
    # ordering-independent regardless
    ymin_b = ymin[cam_id, face_id].astype(np.float32)
    order = np.lexsort((ymin_b, key))
    key_s = key[order]
    face_s = face_id[order]
    starts = np.zeros(C * T + 1, np.int64)
    np.cumsum(counts.reshape(-1), out=starts[1:])
    pos = np.arange(len(key_s)) - starts[key_s]
    keep = pos < cap
    bins = np.full((C * T, cap), -1, np.int32)
    bins[key_s[keep], pos[keep]] = face_s[keep]
    counts = np.minimum(counts, cap).astype(np.int32)
    out = (bins.reshape(C, T, cap), counts.reshape(C, T), occ)
    if return_slots:
        # per-(cam, face) flat slot indices (sentinel T·cap), same contract
        # as bin_triangles_device's face_slots
        K = span_y * span_x
        fslots = np.full((C, F + 1, K), T * cap, np.int32)
        ent_s = ent_id[order]
        fs_cam = (ent_s // K) // F
        fs_face = (ent_s // K) % F
        fs_cell = ent_s % K
        flat = (key_s % T) * cap + pos
        k3 = keep & (flat < T * cap)
        fslots[fs_cam[k3], fs_face[k3], fs_cell[k3]] = flat[k3]
        out = out[:2] + (fslots, occ)
    if return_spans:
        return out + ((span_y, span_x),)
    return out


def bin_triangles_device(v_ndc, faces, resolution, cap, margin=0.0,
                         span=(2, 2), cull=False):
    """Device-side binning for ALL cameras (the large-F REBIN path).

    The host path (:func:`bin_triangles_host`) measured 7.9 s of numpy plus
    a 12 s bins upload over the axon tunnel (~3.6 MB/s) per rebin at 327k
    faces — 20 s of dead time every rebin window.  On device the same
    computation is ONE argsort per camera over statically-expanded
    (face, tile) entries: each face emits ``span_y·span_x`` candidate tile
    slots from its clipped bbox tile range (tiny triangles at the ≥100k-face
    scale span 1-2 tiles; the driver validates the static span bound at
    epoch build and falls back to host binning if exceeded), the entries are
    sorted by a combined (tile, ymin) key — preserving the y-coherence the
    forward kernel's band skip relies on — and scattered into the
    fixed-capacity bins.  ~17M key-sorts per 13-camera rebin, entirely on
    device: no host fetch, no tunnel upload.

    v_ndc (C, V, 4) device array.  Returns (bins (C, T, cap) int32 with -1
    padding, counts (C, T) int32, face_slots (C, F+1, span_y·span_x) int32
    flat slot indices with sentinel T·cap — the inverse mapping consumed by
    :func:`_scatter_via_slots`, occ (scalar device array — fetch lazily)).
    With ``cull=True`` screen-space back-facing triangles are dropped
    (valid for closed meshes where a backface never wins the z-test).
    """
    height, width = resolution
    ty_n, tx_n = height // TILE_H, width // TILE_W
    T = ty_n * tx_n
    faces = jnp.asarray(faces)
    F = faces.shape[0]
    span_y, span_x = span
    K = span_y * span_x

    def per_cam(vc):
        tri = vc[faces]                                   # (F, 3, 4)
        w = tri[..., 3]
        safe_w = jnp.where(w == 0, 1.0, w)
        iw = 1.0 / safe_w
        sx = tri[..., 0] * iw
        sy = tri[..., 1] * iw
        valid = jnp.all(w > 1e-9, axis=1)
        area = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0])
                - (sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0]))
        if cull:
            # front faces have POSITIVE screen-space area under the
            # negated-x Mitsuba projection (test_backface_cull_image_parity)
            valid &= area > 0.0
        else:
            valid &= jnp.abs(area) >= 1e-12
        exp = 1.0 + margin
        xmin = (jnp.min(sx, axis=1) + 1.0) * (width / 2.0) - 0.5 - exp
        xmax = (jnp.max(sx, axis=1) + 1.0) * (width / 2.0) - 0.5 + exp
        ymin = (jnp.min(sy, axis=1) + 1.0) * (height / 2.0) - 0.5 - exp
        ymax = (jnp.max(sy, axis=1) + 1.0) * (height / 2.0) - 0.5 + exp
        valid &= (xmax >= 0) & (ymax >= 0) \
            & (xmin <= width - 1) & (ymin <= height - 1)
        jlo = jnp.clip(jnp.floor(xmin).astype(jnp.int32) // TILE_W, 0, tx_n - 1)
        jhi = jnp.clip(jnp.floor(xmax).astype(jnp.int32) // TILE_W, 0, tx_n - 1)
        ilo = jnp.clip(jnp.floor(ymin).astype(jnp.int32) // TILE_H, 0, ty_n - 1)
        ihi = jnp.clip(jnp.floor(ymax).astype(jnp.int32) // TILE_H, 0, ty_n - 1)
        yq = jnp.clip(ymin.astype(jnp.int32), 0, 4095)

        keys, fids = [], []
        fidx = jnp.arange(F, dtype=jnp.int32)
        for dy in range(span_y):
            for dx in range(span_x):
                ti = ilo + dy
                tj = jlo + dx
                live = valid & (ti <= ihi) & (tj <= jhi)
                tile = ti * tx_n + tj
                # combined sort key: (tile, quantized ymin); dead -> T·4096
                key = jnp.where(live, tile * 4096 + yq, T * 4096)
                keys.append(key)
                fids.append(fidx)
        key = jnp.concatenate(keys)                        # (K·F,)
        fid = jnp.concatenate(fids)
        # ONE stable sort carrying (fid, entry-id) as payload — argsort +
        # two post-gathers measured ~2× the cost at 17M entries
        key_s, fid_s, order = jax.lax.sort(
            (key, fid, jnp.arange(K * F, dtype=jnp.int32)), num_keys=1)
        tile_s = key_s // 4096                             # T for dead
        # per-tile starts/counts via searchsorted on the SORTED keys — a
        # sorted segment_sum here measured ~1.2 s/rebin at 17M entries
        starts = jnp.searchsorted(
            key_s, jnp.arange(T + 1, dtype=jnp.int32) * 4096).astype(jnp.int32)
        counts = starts[1:] - starts[:-1]
        # GATHER-built bins (TPU scatter rows run ~8× slower than gather
        # rows — a scatter fill here measured ~2.5 s/rebin at 327k faces):
        # slot (t, p) holds the face at sorted position starts[t] + p
        slot_t = jax.lax.broadcasted_iota(jnp.int32, (T, cap), 0)
        slot_p = jax.lax.broadcasted_iota(jnp.int32, (T, cap), 1)
        live = slot_p < jnp.minimum(counts, cap)[:, None]
        src = jnp.minimum(starts[:T][:, None] + slot_p, K * F - 1)
        bins = jnp.where(live, fid_s[src.reshape(-1)].reshape(T, cap), -1)
        # face→slot inverse, also by gather: entry e of the PRE-SORT layout
        # is (span-cell e//F, face e%F); its sorted position is
        # inv_order[e], whose flat slot is tile·cap + (sortpos − starts).
        # One extra argsort inverts the permutation; reshaping (K, F) then
        # gives each face its K candidate slots (sentinel T·cap).
        inv_order = jnp.argsort(order)
        pos_sorted = jnp.arange(K * F, dtype=jnp.int32) \
            - starts[jnp.minimum(tile_s, T)]
        keep_s = (tile_s < T) & (pos_sorted < cap)
        lin_sorted = jnp.where(keep_s, tile_s * cap + pos_sorted, T * cap)
        lin_e = lin_sorted[inv_order]
        fslots = jnp.concatenate(
            [lin_e.reshape(K, F).T,
             jnp.full((1, K), T * cap, jnp.int32)])        # (F+1, K)
        return (bins.reshape(T, cap), jnp.minimum(counts, cap), fslots,
                counts.max())

    bins, counts, fslots, occs = jax.vmap(per_cam)(v_ndc)
    return bins, counts, fslots, occs.max()


def suggest_cap(max_count: int, chunk: int = 8) -> int:
    """Round a measured max bin occupancy up to a kernel-friendly capacity."""
    c = max(chunk * 4, int(max_count * 1.25))
    return ((c + 127) // 128) * 128


def check_bin_overflow(v_clip, faces, resolution, cap=None):
    """Max bin occupancy over all cameras/tiles (host diagnostic)."""
    height, width = resolution
    faces = jnp.asarray(faces)
    F = faces.shape[0]
    dummy_attrs = jnp.zeros((v_clip.shape[1], 3), jnp.float32)
    dummy_opp = jnp.zeros((F, 3), jnp.int32)

    def per_cam(vc):
        rec_fwd, _ = triangle_setup(vc, faces, dummy_attrs, dummy_opp,
                                    height, width)
        _, counts = bin_triangles(rec_fwd, vc, faces, height, width, 8)
        return counts.max()

    return int(jax.jit(jax.vmap(per_cam))(v_clip).max())


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _pixel_lanes(ti, tj, height, width):
    """Pixel-center NDC coords in the (1, P) lane layout (p = row·W + col)."""
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    pcol = (pidx % TILE_W).astype(jnp.float32)
    prow = (pidx // TILE_W).astype(jnp.float32)
    px = ((tj * TILE_W).astype(jnp.float32) + pcol + 0.5) * (2.0 / width) - 1.0
    py = ((ti * TILE_H).astype(jnp.float32) + prow + 0.5) * (2.0 / height) - 1.0
    return px, py


def _chunks(cap):
    """Static (base, width) chunking of the slot axis for one-hot matmuls."""
    if cap <= _OH:
        return [(0, cap)]
    assert cap % _OH == 0, cap     # suggest_cap rounds to multiples of 128
    return [(h, _OH) for h in range(0, cap, _OH)]


def _split3(x):
    """Exact-ish 3-term bf16 decomposition: x ≈ hi + mid + lo to ~2⁻²⁴
    relative — full f32 effective precision from bf16 MXU passes."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _split2(x):
    """2-term bf16 decomposition: x ≈ hi + mid to ~2⁻¹⁶ relative.  Used
    for the BACKWARD per-slot reductions only — gradient sums tolerate
    1.5e-5 relative error (tests bound them at 1e-4), and dropping the
    third MXU pass cuts the dominant backward matmul cost by a third.
    Forward gathers keep the 3-term split (image parity is tested at
    1e-5 absolute)."""
    hi = x.astype(jnp.bfloat16)
    mid = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid


def _onehot_gather(recT_ref, slot_plane, cap, count, facc):
    """Owner-field gather as chunked one-hot MXU matmuls.

    recT_ref → (32, cap); slot_plane (1, P) int32 with -1 = background;
    facc (32, P) VMEM scratch.  Computes recT[:, slot_plane] (zeros where
    background) into facc — the TPU-idiomatic replacement for a per-pixel
    row gather.  Chunks past ``count`` are skipped (their slots are never
    referenced).
    """
    facc[...] = jnp.zeros(facc.shape, jnp.float32)
    terms = _split3(recT_ref[...])
    for h, w in _chunks(cap):
        @pl.when(h < count)
        def _():
            # NOTE: `iota == slot` here vs `(iota - key) == 0` in
            # _onehot_reduce is deliberate: Mosaic crashes when one one-hot
            # value feeds dots of both contraction orientations, so the two
            # builders must not CSE together.
            iota = jax.lax.broadcasted_iota(jnp.int32, (w, _P), 0) + h
            ohb = (iota == slot_plane).astype(jnp.bfloat16)
            for t in terms:
                facc[...] += jax.lax.dot_general(
                    t[:, h:h + w], ohb, ((((1,), (0,))), ((), ())),
                    preferred_element_type=jnp.float32)


def _onehot_reduce(S_ref, key_col, key_plane, G, cap, count):
    """Per-slot sums as chunked one-hot MXU matmuls.

    key_col (cap, 1) per-slot key (f32); key_plane (1, P) per-pixel key;
    G (Q, P) per-pixel quantities.  Writes into the (cap, 128) VMEM scratch
    ``S_ref`` (128-lane so Mosaic's tile-aligned-store rule holds):
    S[t, :Q] = Σ_{p: key_plane[p] == key_col[t]} G[:, p]; columns ≥ Q zero.
    The caller copies ``S_ref[...][:, :ncols]`` into its output block.
    """
    q = G.shape[0]
    if q < 128:
        # pad quantity rows to the scratch lane width: whole-row stores only
        G = jnp.concatenate(
            [G, jnp.zeros((128 - q, G.shape[1]), jnp.float32)], axis=0)
    S_ref[...] = jnp.zeros(S_ref.shape, jnp.float32)
    terms = _split2(G)
    for h, w in _chunks(cap):
        @pl.when(h < count)
        def _():
            ohb = ((key_col[h:h + w] - key_plane) == 0.0).astype(jnp.bfloat16)
            acc = None
            for t in terms:
                d = jax.lax.dot_general(ohb, t, ((((1,), (1,))), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            S_ref[pl.ds(h, w), :] = acc


def _onehot_gather_bykey(recT_ref, key_col, key_plane, cap, count, facc):
    """Like :func:`_onehot_gather` but matching on per-slot key VALUES
    (e.g. face ids) instead of slot positions.  key_col (cap, 1) f32;
    key_plane (1, P) f32.  Padded slots carry key 0; a 0-valued pixel key
    (background owner) then matches every padded slot, summing their
    all-zero records — harmless by construction."""
    facc[...] = jnp.zeros(facc.shape, jnp.float32)
    terms = _split3(recT_ref[...])
    for h, w in _chunks(cap):
        @pl.when(h < count)
        def _():
            ohb = (key_col[h:h + w] == key_plane).astype(jnp.bfloat16)
            for t in terms:
                facc[...] += jax.lax.dot_general(
                    t[:, h:h + w], ohb, ((((1,), (0,))), ((), ())),
                    preferred_element_type=jnp.float32)


# --- fori-loop variants for LARGE caps ------------------------------------
# The helpers above unroll cap/128 chunk bodies in Python — at suzanne-class
# caps (≤1024, ≤8 chunks) that is the fastest Mosaic code, but at the
# ≥100k-vertex tier (cap 10k-40k, 100-300 chunks) the unrolled program
# explodes compile time.  These variants run the identical math under
# ``lax.fori_loop``, slicing each 128-slot chunk straight from the block
# ref (so the full (32, cap) record never materializes in registers).

_UNROLL_CAP = 1024


def _onehot_gather_ref(recT_ref, pre, slot_plane, count, facc):
    """fori one-hot gather; recT_ref block (*pre, 32, cap).

    BAND-WINDOWED: each 8-row pixel band gathers only the slot chunks in
    its own [min, max] winner-slot window.  Bins are ymin-sorted, so a
    band's winners live in a narrow contiguous slot range — this both
    skips chunks outside the window AND shrinks every dot from
    (·, P=4096) to (·, BAND_P=1024): ~4× fewer MXU FLOPs at large caps."""
    facc[...] = jnp.zeros(facc.shape, jnp.float32)
    max_chunks = (count + _OH - 1) // _OH
    for band in range(_BANDS):
        sl = slice(band * _BAND_P, (band + 1) * _BAND_P)
        sp = slot_plane[:, sl]                        # (1, BAND_P)
        cov = sp >= 0
        lo = jnp.min(jnp.where(cov, sp, jnp.int32(1 << 30)))
        hi = jnp.max(jnp.where(cov, sp, jnp.int32(-1)))
        c0 = lo // _OH
        c1 = jnp.minimum(hi // _OH + 1, max_chunks)

        def body(c, carry, sl=sl, sp=sp):
            h = c * _OH
            rec = recT_ref[pre[0], pre[1], pre[2], :, pl.ds(h, _OH)]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (_OH, _BAND_P), 0) + h
            ohb = (iota == sp).astype(jnp.bfloat16)
            for t in _split3(rec):
                facc[:, sl] += jax.lax.dot_general(
                    t, ohb, ((((1,), (0,))), ((), ())),
                    preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(c0, c1, body, 0)


def _onehot_reduce_out(out_ref, key_plane, G, count):
    """fori one-hot reduce onto slot-position keys (iota), writing 128-row
    result chunks straight into the (1, 1, 1, cap, 32) output block (no
    (cap, 128) scratch — it would blow the scoped-VMEM budget at large
    caps).  Zero-initializes the whole block first (the tail rows past
    ``count`` must not carry stale garbage).

    BAND-WINDOWED like :func:`_onehot_gather_ref`: each 8-row band reduces
    only its own winner-slot chunk window (accumulating read-modify-write —
    bands run sequentially, and windows may overlap at chunk granularity)."""
    cap, ncols = out_ref.shape[-2], out_ref.shape[-1]
    out_ref[0, 0, 0] = jnp.zeros((cap, ncols), jnp.float32)
    q = G.shape[0]
    if q < 128:
        G = jnp.concatenate(
            [G, jnp.zeros((128 - q, G.shape[1]), jnp.float32)], axis=0)
    slot_iota_plane = key_plane.astype(jnp.int32)
    max_chunks = (count + _OH - 1) // _OH
    for band in range(_BANDS):
        sl = slice(band * _BAND_P, (band + 1) * _BAND_P)
        sp = slot_iota_plane[:, sl]
        cov = sp >= 0
        lo = jnp.min(jnp.where(cov, sp, jnp.int32(1 << 30)))
        hi = jnp.max(jnp.where(cov, sp, jnp.int32(-1)))
        c0 = lo // _OH
        c1 = jnp.minimum(hi // _OH + 1, max_chunks)
        terms = _split2(G[:, sl])

        def body(c, carry, sp=sp, terms=terms):
            h = c * _OH
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (_OH, _BAND_P), 0) + h
            ohb = ((iota - sp) == 0).astype(jnp.bfloat16)
            acc = None
            for t in terms:
                d = jax.lax.dot_general(ohb, t, ((((1,), (1,))), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            out_ref[0, 0, 0, pl.ds(h, _OH), :] = (
                out_ref[0, 0, 0, pl.ds(h, _OH), :] + acc[:, :ncols])
            return carry

        jax.lax.fori_loop(c0, c1, body, 0)


def _key_col(key_rows):
    """(8, 128) f32 record rows → (128, 1) column of ROW 0's values, via a
    3-pass bf16 identity matmul (the MXU replacement for a lane→sublane
    relayout, which Mosaic lowers poorly; rank-1 operands trip a Mosaic
    verifier bug, hence the 8-row operand).  Exact for integer-valued keys
    < 2²⁴: the bf16 split captures 8 mantissa bits per term and the f32
    accumulator re-sums them losslessly."""
    i = jax.lax.broadcasted_iota(jnp.int32, (_OH, _OH), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (_OH, _OH), 1)
    eye = (i == j).astype(jnp.bfloat16)
    acc = None
    for t in _split3(key_rows):
        d = jax.lax.dot_general(eye, t, ((((1,), (1,))), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc[:, 0:1]                           # (128, 1)


def _onehot_gather_bykey_ref(recT_ref, pre, key_plane, count, facc,
                             key_row=6, tbl=None, tile_y0=None):
    """fori bykey gather from a transposed record block (*pre, R, cap);
    per-slot keys come from record ROW ``key_row`` of the same block
    (slim layout: row 6 = fid), turned into a column by :func:`_key_col` —
    so the kernel needs no (cap, 32)-layout operand at all (27 MB of VMEM
    per buffer at 163k-vertex caps).

    BAND-WINDOWED when ``tbl`` is given: tbl (2, nch) carries per-chunk
    [running-max ymax; min ymin] (pixel rows, monotone ymin from the
    ymin-sorted bins, +BIG padding), so each 8-row pixel band loops only
    over the chunk range whose y-span can reach it (owners may sit one
    pixel outside the band — the stored bbox rows are already 1px
    expanded).  Sound bounds: the running max makes the skipped prefix a
    true prefix; min-ymin is monotone so the tail cut is exact."""
    facc[...] = jnp.zeros(facc.shape, jnp.float32)
    max_chunks = (count + _OH - 1) // _OH
    if tbl is None:
        bands = [(slice(0, _P), jnp.int32(0), max_chunks)]
    else:
        run = tbl[0:1, :]
        ymn = tbl[1:2, :]
        bands = []
        for band in range(_BANDS):
            y0b = tile_y0 + band * 8.0
            # ±2px slack: device bins sort by QUANTIZED ymin, so chunk
            # minima are monotone only up to 1px; the stored rows are
            # already 1px-expanded for the pair reach
            c0 = jnp.sum((run < y0b - 2.0).astype(jnp.int32))
            c1 = jnp.minimum(
                jnp.sum((ymn <= y0b + 10.0).astype(jnp.int32)), max_chunks)
            bands.append((slice(band * _BAND_P, (band + 1) * _BAND_P),
                          c0, c1))
    for sl, c0, c1 in bands:
        kp = key_plane[:, sl]

        def body(c, carry, sl=sl, kp=kp):
            h = c * _OH
            rec = recT_ref[pre[0], pre[1], pre[2], :, pl.ds(h, _OH)]
            key_col = _key_col(rec[key_row:key_row + 8, :])        # (128, 1)
            ohb = (key_col == kp).astype(jnp.bfloat16)
            for t in _split3(rec):
                facc[:, sl] += jax.lax.dot_general(
                    t, ohb, ((((1,), (0,))), ((), ())),
                    preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(c0, c1, body, 0)


def _onehot_reduce_bykey_add(out_ref, recT_ref, pre, key_plane, G, count,
                             key_row=6, init: bool = False, tbl=None,
                             tile_y0=None):
    """fori one-hot reduce keyed by per-slot key VALUES (face ids, read
    from ROW ``key_row`` of the transposed record block via
    :func:`_key_col`), ACCUMULATED into the (1, 1, 1, cap, ncols) output
    block — lets the two AA pair directions share one output without
    (cap, 128) scratches.  Pass ``init=True`` on the first direction to
    zero the block.  BAND-WINDOWED via ``tbl``/``tile_y0`` exactly like
    :func:`_onehot_gather_bykey_ref`."""
    cap, ncols = out_ref.shape[-2], out_ref.shape[-1]
    if init:
        out_ref[0, 0, 0] = jnp.zeros((cap, ncols), jnp.float32)
    q = G.shape[0]
    if q < 128:
        G = jnp.concatenate(
            [G, jnp.zeros((128 - q, G.shape[1]), jnp.float32)], axis=0)
    max_chunks = (count + _OH - 1) // _OH
    if tbl is None:
        bands = [(slice(0, _P), jnp.int32(0), max_chunks)]
    else:
        run = tbl[0:1, :]
        ymn = tbl[1:2, :]
        bands = []
        for band in range(_BANDS):
            y0b = tile_y0 + band * 8.0
            # ±2px slack: device bins sort by QUANTIZED ymin, so chunk
            # minima are monotone only up to 1px; the stored rows are
            # already 1px-expanded for the pair reach
            c0 = jnp.sum((run < y0b - 2.0).astype(jnp.int32))
            c1 = jnp.minimum(
                jnp.sum((ymn <= y0b + 10.0).astype(jnp.int32)), max_chunks)
            bands.append((slice(band * _BAND_P, (band + 1) * _BAND_P),
                          c0, c1))
    for sl, c0, c1 in bands:
        kp = key_plane[:, sl]
        terms = _split2(G[:, sl])

        def body(c, carry, kp=kp, terms=terms):
            h = c * _OH
            key_col = _key_col(
                recT_ref[pre[0], pre[1], pre[2], key_row:key_row + 8,
                         pl.ds(h, _OH)])
            ohb = ((key_col - kp) == 0.0).astype(jnp.bfloat16)
            acc = None
            for t in terms:
                d = jax.lax.dot_general(ohb, t, ((((1,), (1,))), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            out_ref[0, 0, 0, pl.ds(h, _OH), :] = (
                out_ref[0, 0, 0, pl.ds(h, _OH), :] + acc[:, :ncols])
            return carry

        jax.lax.fori_loop(c0, c1, body, 0)


def _fwd_kernel(counts_ref, row0_ref, rec_ref, recT_ref, u_ref, v_ref, z_ref, fid_ref,
                slot_ref, c0_ref, c1_ref, c2_ref, zb, fb, sb, facc,
                *, cap, chunk, height, width):
    ci = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    count = counts_ref[ci, ti, tj]
    tig = ti + row0_ref[0]          # global tile row (sp row-sharding)
    px, py = _pixel_lanes(tig, tj, height, width)
    tile_y0 = (tig * TILE_H).astype(jnp.float32)

    zb[...] = jnp.full((1, _P), _BIG, jnp.float32)
    fb[...] = jnp.full((1, _P), _BIG, jnp.float32)
    sb[...] = jnp.full((1, _P), -1.0, jnp.float32)

    # Mosaic only supports integer iota; cast after
    sub_iota = jax.lax.broadcasted_iota(
        jnp.int32, (chunk, _BAND_P), 0).astype(jnp.float32)

    # ---- z-loop: triangles vectorized over the chunk (sublane) axis ------
    # Winner selection is (depth, fid)-lexicographic — order-independent,
    # equal to the oracle's ascending-face-id scan with a strict z test.
    def chunk_body(c, carry):
        rec = rec_ref[0, 0, 0, pl.ds(c * chunk, chunk), :]    # (chunk, 32)
        cymin = jnp.min(rec[:, 12:13])
        cymax = jnp.max(rec[:, 13:14])
        fid_col = rec[:, 14:15]                               # (chunk, 1)
        slot0 = (c * chunk).astype(jnp.float32)
        for band in range(_BANDS):
            y0 = tile_y0 + band * 8

            @pl.when((cymax >= y0) & (cymin < y0 + 8.0))
            def _():
                sl = slice(band * _BAND_P, (band + 1) * _BAND_P)
                pxb = px[0:1, sl]
                pyb = py[0:1, sl]
                q0 = rec[:, 0:1] * pxb + rec[:, 1:2] * pyb + rec[:, 2:3]
                q1 = rec[:, 3:4] * pxb + rec[:, 4:5] * pyb + rec[:, 5:6]
                s = rec[:, 6:7] * pxb + rec[:, 7:8] * pyb + rec[:, 8:9]
                d = rec[:, 9:10] * pxb + rec[:, 10:11] * pyb + rec[:, 11:12]
                q2 = s - q0 - q1
                cov = (q0 >= 0.0) & (q1 >= 0.0) & (q2 >= 0.0) & (s > 0.0)
                dm = jnp.where(cov, d, _BIG)                  # (chunk, BAND_P)
                m = jnp.min(dm, axis=0, keepdims=True)        # (1, BAND_P)
                fidw = jnp.min(jnp.where(dm == m, fid_col, _BIG),
                               axis=0, keepdims=True)
                slotw = jnp.min(
                    jnp.where((dm == m) & (fid_col == fidw),
                              sub_iota + slot0, _BIG),
                    axis=0, keepdims=True)
                zs = zb[0:1, sl]
                fs = fb[0:1, sl]
                # the == clause must see real coverage: with no candidate,
                # m == zs == _BIG and the chunk's min fid must NOT win
                closer = (m < zs) | ((m == zs) & (fidw < fs) & (m < _BIG))
                zb[0:1, sl] = jnp.where(closer, m, zs)
                fb[0:1, sl] = jnp.where(closer, fidw, fs)
                sb[0:1, sl] = jnp.where(closer, slotw, sb[0:1, sl])
        return carry

    n_chunks = jnp.minimum((count + chunk - 1) // chunk, cap // chunk)
    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # ---- finalize: gather the winner's record, interpolate densely -------
    slot_plane = sb[...]
    if cap > _UNROLL_CAP:
        _onehot_gather_ref(recT_ref, (0, 0, 0), slot_plane.astype(jnp.int32),
                           count, facc)
    else:
        _onehot_gather(recT_ref[0, 0, 0], slot_plane.astype(jnp.int32), cap,
                       count, facc)
    f = facc[...]                                            # (32, P)
    q0 = f[0:1] * px + f[1:2] * py + f[2:3]
    q1 = f[3:4] * px + f[4:5] * py + f[5:6]
    s = f[6:7] * px + f[7:8] * py + f[8:9]
    inv_s = 1.0 / jnp.where(s == 0.0, 1.0, s)
    u = q0 * inv_s
    v = q1 * inv_s
    covered = slot_plane >= 0.0
    shape2d = (TILE_H, TILE_W)
    u_ref[0] = u.reshape(shape2d)
    v_ref[0] = v.reshape(shape2d)
    z_ref[0] = jnp.where(covered, zb[...], 0.0).reshape(shape2d)
    fid_ref[0] = f[14:15].reshape(shape2d)
    slot_ref[0] = slot_plane.reshape(shape2d)
    c0_ref[0] = (u * f[16:17] + v * f[17:18] + f[18:19]).reshape(shape2d)
    c1_ref[0] = (u * f[19:20] + v * f[20:21] + f[21:22]).reshape(shape2d)
    c2_ref[0] = (u * f[22:23] + v * f[23:24] + f[24:25]).reshape(shape2d)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ccall_kwargs(cap):
    """Extra pallas_call kwargs per capacity: large-cap kernels hold two
    ~(cap, 32) f32 blocks in VMEM, which exceeds Mosaic's default scoped
    budget (16 MB) — raise the per-kernel limit (v5e has 128 MB VMEM)."""
    if cap <= _UNROLL_CAP:
        return {}
    # NOTE: the vmem_limit override is dropped when the call sits inside a
    # lax.map/while body on the axon AOT path (and has_side_effects=True,
    # which preserves it, crashes XLA's fusion pass at scale:
    # "Check failed: fused_root->IsFusible()") — so the large-F pipeline
    # unrolls its camera loop in Python instead of lax.map.
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024)}


@partial(jax.jit, static_argnames=("resolution", "cap", "chunk", "interpret"))
def raster_fwd_pallas(rec_fwd_b, counts_b, resolution, cap, chunk=8,
                      interpret=None, row0=None):
    """Forward rasterize+interpolate from pre-binned records.

    rec_fwd_b (C, TY, TX, cap, 32), counts_b (C, TY, TX) int32.
    Returns (u, v, z, fid, slot, col0, col1, col2), each (C, H, W) f32.
    """
    height, width = resolution
    if interpret is None:
        interpret = _interpret()
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    C, ty, tx = counts_b.shape
    recT = jnp.swapaxes(rec_fwd_b, -1, -2)        # (C, TY, TX, 32, cap)
    kernel = partial(_fwd_kernel, cap=cap, chunk=chunk,
                     height=height, width=width)
    # outputs span the LOCAL tile rows (= full image unless row-sharded)
    out_shape = [jax.ShapeDtypeStruct((C, ty * TILE_H, width),
                                      jnp.float32)] * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 1, 1, cap, 32),
                         lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 32, cap),
                         lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda c, i, j, counts, row0: (c, i, j),
                         memory_space=pltpu.VMEM)
        ] * 8,
        scratch_shapes=[pltpu.VMEM((1, _P), jnp.float32)] * 3
        + [pltpu.VMEM((32, _P), jnp.float32)],
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        **_ccall_kwargs(cap),
    )(counts_b, row0, rec_fwd_b, recT)
    return outs


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------
# Analytic gradient of (u, v, color) w.r.t. screen coordinates, inverse-w and
# attributes of the owning triangle (nvdiffrast's rasterize+interpolate
# backward semantics, SURVEY N1).  Derivation lives in the per-pixel math in
# phase B below; per-slot sums come out of phase C's MXU one-hot matmuls.
# Chaining screen-space (dsx, dsy, diw) to clip coordinates happens in XLA
# (see _chain_planes).

_NQ = 18   # dsx0,dsy0,dsx1,dsy1,dsx2,dsy2, diw0..2, dA00,dA01,dA02,... dA22


def _bwd_kernel(counts_ref, row0_ref, recT_ref, slot_ref, dc0_ref, dc1_ref, dc2_ref,
                du_ref, dv_ref, out_ref, facc, Sacc,
                *, cap, chunk, height, width):
    ci = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    count = counts_ref[ci, ti, tj]
    px, py = _pixel_lanes(ti + row0_ref[0], tj, height, width)

    slot_plane = slot_ref[0].reshape(1, _P)

    # ---- phase A: per-pixel owner fields via one-hot MXU gather ----------
    if cap > _UNROLL_CAP:
        _onehot_gather_ref(recT_ref, (0, 0, 0), slot_plane.astype(jnp.int32),
                           count, facc)
    else:
        _onehot_gather(recT_ref[0, 0, 0], slot_plane.astype(jnp.int32), cap,
                       count, facc)
    f = facc[...]                                              # (32, P)

    # ---- phase B: dense per-pixel gradient math (lane layout) ------------
    dc0 = dc0_ref[0].reshape(1, _P)
    dc1 = dc1_ref[0].reshape(1, _P)
    dc2 = dc2_ref[0].reshape(1, _P)
    b0 = f[0:1] * px + f[1:2] * py + f[2:3]
    b1 = f[3:4] * px + f[4:5] * py + f[5:6]
    iw0, iw1, iw2 = f[6:7], f[7:8], f[8:9]
    du = dc0 * f[16:17] + dc1 * f[18:19] + dc2 * f[20:21] + du_ref[0].reshape(1, _P)
    dv = dc0 * f[17:18] + dc1 * f[19:20] + dc2 * f[21:22] + dv_ref[0].reshape(1, _P)
    b2 = 1.0 - b0 - b1
    s = b0 * iw0 + b1 * iw1 + b2 * iw2
    inv_s = 1.0 / jnp.where(s == 0.0, 1.0, s)
    u = b0 * iw0 * inv_s
    v = b1 * iw1 * inv_s
    dA00, dA01, dA02 = dc0 * u, dc1 * u, dc2 * u
    dA10, dA11, dA12 = dc0 * v, dc1 * v, dc2 * v
    w2 = jnp.where(s == 0.0, 0.0, 1.0 - u - v)
    dA20, dA21, dA22 = dc0 * w2, dc1 * w2, dc2 * w2
    h = du * u + dv * v
    db0 = (du * iw0 - h * (iw0 - iw2)) * inv_s
    db1 = (dv * iw1 - h * (iw1 - iw2)) * inv_s
    diw0 = b0 * (du - h) * inv_s
    diw1 = b1 * (dv - h) * inv_s
    diw2 = -h * b2 * inv_s
    inva = f[15:16]
    g0 = db0 * inva
    g1 = db1 * inva
    garea = -(b0 * db0 + b1 * db1) * inva
    sx0, sy0, sx1, sy1, sx2, sy2 = (f[9:10], f[10:11], f[11:12],
                                    f[12:13], f[13:14], f[14:15])
    dsx0 = g1 * (py - sy2) + garea * (sy1 - sy2)
    dsy0 = g1 * (sx2 - px) + garea * (sx2 - sx1)
    dsx1 = g0 * (sy2 - py) + garea * (sy2 - sy0)
    dsy1 = g0 * (px - sx2) + garea * (sx0 - sx2)
    dsx2 = g0 * (py - sy1) + g1 * (sy0 - py) + garea * (sy0 - sy1)
    dsy2 = g0 * (sx1 - px) + g1 * (px - sx0) + garea * (sx1 - sx0)

    G = jnp.concatenate(
        (dsx0, dsy0, dsx1, dsy1, dsx2, dsy2, diw0, diw1, diw2,
         dA00, dA01, dA02, dA10, dA11, dA12, dA20, dA21, dA22), axis=0)

    # ---- phase C: per-pixel -> per-slot reduction on the MXU -------------
    if cap > _UNROLL_CAP:
        # large caps: write 128-slot result chunks straight into the output
        # block — a (cap, 128) scratch would blow the scoped-VMEM budget
        _onehot_reduce_out(out_ref, slot_plane, G, count)
    else:
        key_col = jax.lax.broadcasted_iota(
            jnp.int32, (cap, 1), 0).astype(jnp.float32)
        _onehot_reduce(Sacc, key_col, slot_plane, G, cap, count)
        out_ref[0, 0, 0] = Sacc[...][:, :32]


@partial(jax.jit, static_argnames=("resolution", "cap", "chunk", "interpret"))
def raster_bwd_pallas(rec_bwd_b, counts_b, slot, d_col, d_u, d_v,
                      resolution, cap, chunk=8, interpret=None, row0=None):
    """Backward: per-(camera, tile, slot) gradient sums.

    rec_bwd_b (C, TY, TX, cap, 32); slot (C, H, W) f32 (-1 = background);
    d_col (C, H, W, 3) cotangent on the interpolated color; d_u/d_v
    (C, H, W) cotangents on the u/v outputs.  Returns (C, TY, TX, cap, 32)
    where the first 18 columns are
    [dsx0 dsy0 dsx1 dsy1 dsx2 dsy2 diw0 diw1 diw2 dA00..dA22].
    """
    height, width = resolution
    if interpret is None:
        interpret = _interpret()
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    C, ty, tx = counts_b.shape
    recT = jnp.swapaxes(rec_bwd_b, -1, -2)        # (C, TY, TX, 32, cap)
    kernel = partial(_bwd_kernel, cap=cap, chunk=chunk,
                     height=height, width=width)
    plane = pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda c, i, j, counts, row0: (c, i, j),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, ty, tx),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 32, cap),
                         lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            plane, plane, plane, plane, plane, plane,
        ],
        out_specs=pl.BlockSpec((1, 1, 1, cap, 32),
                               lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        # large caps reduce straight into the out block; the (cap, 128)
        # scratch would blow the scoped-VMEM budget
        scratch_shapes=[pltpu.VMEM((32, _P), jnp.float32),
                        pltpu.VMEM((min(cap, _UNROLL_CAP), 128),
                                   jnp.float32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, ty, tx, cap, 32), jnp.float32),
        interpret=interpret, **_ccall_kwargs(cap),
    )(counts_b, row0, recT, slot,
      d_col[..., 0], d_col[..., 1], d_col[..., 2], d_u, d_v)


# ---------------------------------------------------------------------------
# XLA glue: binning for all cameras, slot-gradient chaining, vertex scatter
# ---------------------------------------------------------------------------

def _setup_and_bin(v_clip, faces, attrs, opp, height, width, cap,
                   ty_range=None):
    """vmapped setup+binning: returns (rec_fwd_b, rec_bwd_b, bins, counts)
    with shapes (C, TY, TX, cap, 32) ×2, (C, TY, TX, cap), (C, TY, TX);
    TY is the local row count under ``ty_range`` row sharding."""
    ty, tx = height // TILE_H, width // TILE_W
    if ty_range is not None:
        ty = ty_range[1]

    def per_cam(vc):
        rec_fwd, rec_bwd = triangle_setup(vc, faces, attrs, opp, height, width)
        bins, counts = bin_triangles(rec_fwd, vc, faces, height, width, cap,
                                     ty_range)
        safe = jnp.maximum(bins, 0)
        live = (bins >= 0)[..., None]
        rfb = jnp.where(live, rec_fwd[safe], 0.0)
        rbb = jnp.where(live, rec_bwd[safe], 0.0)
        # padded slots: empty y-range so they can't poison the forward
        # kernel's chunk-level band-bbox test (a zeroed row reads as y=0)
        dead = bins < 0
        rfb = rfb.at[..., 12].set(jnp.where(dead, 1e9, rfb[..., 12]))
        rfb = rfb.at[..., 13].set(jnp.where(dead, -1e9, rfb[..., 13]))
        return (rfb.reshape(ty, tx, cap, 32), rbb.reshape(ty, tx, cap, 32),
                bins.reshape(ty, tx, cap),
                jnp.minimum(counts, cap).astype(jnp.int32).reshape(ty, tx))

    return jax.vmap(per_cam)(v_clip)


def _chain_planes(dslot, dslot_aa, boost, rbb):
    """Planar chain-to-clip: per-slot screen-space sums -> a corner-major
    (..., cap, 18) gradient table [per corner: dx dy dw dA0 dA1 dA2]
    (dz is identically zero and is reassembled by the scatter stage —
    carrying the zero plane cost 14% of this stage's traffic).

    Replaces the stacked chain-to-clip + boost combine + dclip/dA concat, but every intermediate is a (..., cap) PLANE: the stacked
    (..., cap, 3, 4) form tile-pads its trailing dims to (8, 128) — a 42×
    HBM blowup that OOMs at 100k+-face caps.

    dslot (..., cap, 32) raster sums; dslot_aa (..., cap, 8) antialias
    endpoint sums (cols 0..5) or None; rbb (..., cap, 32) bwd records.
    """
    iw = [rbb[..., 6 + k] for k in range(3)]
    sx = [rbb[..., 9 + 2 * k] for k in range(3)]
    sy = [rbb[..., 10 + 2 * k] for k in range(3)]
    planes = []
    for k in range(3):
        dsx = dslot[..., 2 * k]
        dsy = dslot[..., 2 * k + 1]
        if dslot_aa is not None:
            dsx = dsx + boost * dslot_aa[..., 2 * k]
            dsy = dsy + boost * dslot_aa[..., 2 * k + 1]
        diw = dslot[..., 6 + k]
        # sx = x/w => dx = dsx*iw, dw = -iw^2*diw - iw*(dsx*sx + dsy*sy)
        planes += [dsx * iw[k], dsy * iw[k],
                   -iw[k] * iw[k] * diw - iw[k] * (dsx * sx[k] + dsy * sy[k]),
                   dslot[..., 9 + 3 * k], dslot[..., 10 + 3 * k],
                   dslot[..., 11 + 3 * k]]
    table = jnp.stack(planes, axis=-1)           # (..., cap, 18)
    # single choke point for sliver-triangle infs (1/s, 1/area, 1/den²
    # upstream): one inf component NaNs EVERY parameter through
    # AdamUniform's global-max denominator, so drop non-finite per-slot
    # contributions (nvdiffrast skips ill-conditioned terms the same way)
    return jnp.where(jnp.abs(table) < _BIG, table, 0.0)


def build_incidence(faces, n_verts):
    """Static vertex←(face, corner) incidence in padded-row (ELL) form.

    Returns (idx (V, K) int64 flat indices into a corner-major (F·3 + pad)
    table, mask (V, K)); padded entries point at the sentinel row 3F (the
    bin-padding accumulator, which is zero by construction).  Host, once
    per topology epoch."""
    faces = np.asarray(faces)
    F = faces.shape[0]
    vids = faces.reshape(-1)                     # entry j = face j//3, corner j%3
    order = np.argsort(vids, kind="stable")
    counts = np.bincount(vids, minlength=n_verts)
    K = int(counts.max())
    offsets = np.zeros(n_verts + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    k_idx = np.arange(K)[None, :]
    valid = k_idx < counts[:, None]
    slot = np.where(valid, offsets[:-1, None] + k_idx, 0)
    idx = np.where(valid, order[slot], 3 * F).astype(np.int64)
    return idx, valid


def _scatter_via_faces(table18, bins, incidence, n_faces, n_verts):
    """Slot grads -> vertex grads through a per-face table.

    TPU rationale: one segment_sum over the (C·tiles·cap) slot entries
    builds a per-(camera, face, corner) table, then the face→vertex step is
    a STATIC padded-row gather (the mesh incidence) — replacing the
    original triple-width dynamic scatter, whose XLA lowering dominated the
    backward (measured ~9 ms of a 43 ms step at 13×256²).

    table18 (C,TY,TX,cap,18) corner-major gradient table from
    :func:`_chain_planes` ([dx dy dw dA0 dA1 dA2] per corner; dz ≡ 0 is
    reassembled here); bins (C,TY,TX,cap).
    Returns (dv_clip (C, V, 4), d_attrs (V, 3))."""
    idx, mask = incidence
    C = table18.shape[0]
    F = n_faces
    table = table18.reshape(C, -1, 18)
    ids = jnp.where(bins >= 0, bins, F).reshape(C, -1)
    dface = jax.vmap(
        lambda t, i: jax.ops.segment_sum(t, i, num_segments=F + 1)
    )(table, ids)                                          # (C, F+1, 18)
    per_corner = dface.reshape(C, (F + 1) * 3, 6)
    idxj = jnp.asarray(idx.reshape(-1))
    gathered = jax.vmap(lambda d: jnp.take(d, idxj, axis=0))(per_corner)
    gathered = gathered.reshape(C, *idx.shape, 6)
    gathered = gathered * jnp.asarray(mask, gathered.dtype)[None, :, :, None]
    dv = gathered.sum(axis=2)                              # (C, V, 6)
    zeros = jnp.zeros_like(dv[..., :1])
    dv_clip = jnp.concatenate([dv[..., 0:2], zeros, dv[..., 2:3]], axis=-1)
    return dv_clip, dv[..., 3:6].sum(axis=0)


def _scatter_via_slots(table18, fslots, incidence, n_verts):
    """Slot grads -> vertex grads through the face→slot INVERSE mapping.

    Replaces :func:`_scatter_via_faces`' slot→face ``segment_sum`` — an
    848k-row scatter measured at 83 ms/camera at 163k verts — with a
    (F+1)·K-row GATHER (~8× faster per row on TPU) using the ``face_slots``
    table the binning produces for free (see bin_triangles_device).

    table18 (C, TY, TX, cap, 18); fslots (C, F+1, K) flat slot indices with
    sentinel T·cap.  Returns (dv_clip (C, V, 4), d_attrs (V, 3))."""
    idx, mask = incidence
    C = table18.shape[0]
    table = table18.reshape(C, -1, 18)
    # sentinel row: zeros
    table = jnp.concatenate(
        [table, jnp.zeros((C, 1, 18), table.dtype)], axis=1)
    K = fslots.shape[-1]
    Fp1 = fslots.shape[1]
    gath = jax.vmap(lambda t, s: jnp.take(t, s.reshape(-1), axis=0))(
        table, fslots)
    dface = gath.reshape(C, Fp1, K, 18).sum(axis=2)        # (C, F+1, 18)
    per_corner = dface.reshape(C, Fp1 * 3, 6)
    idxj = jnp.asarray(idx.reshape(-1))
    gathered = jax.vmap(lambda d: jnp.take(d, idxj, axis=0))(per_corner)
    gathered = gathered.reshape(C, *idx.shape, 6)
    gathered = gathered * jnp.asarray(mask, gathered.dtype)[None, :, :, None]
    dv = gathered.sum(axis=2)                              # (C, V, 6)
    zeros = jnp.zeros_like(dv[..., :1])
    dv_clip = jnp.concatenate([dv[..., 0:2], zeros, dv[..., 2:3]], axis=-1)
    return dv_clip, dv[..., 3:6].sum(axis=0)


def _scatter_to_vertices(dclip, dA, bins, faces, n_verts, segment_fn=None):
    """Per-slot per-vertex grads -> (C, V, 4) clip grads and (V, 3) attr grads.

    dclip (C, TY, TX, cap, 3, 4); dA (C, TY, TX, cap, 3, 3) with vertex-major
    layout [dA0c dA1c dA2c]; bins (C, TY, TX, cap) int32 (-1 padding)."""
    if segment_fn is None:
        segment_fn = lambda d, i, n: jax.ops.segment_sum(d, i, num_segments=n)
    faces = jnp.asarray(faces)
    C = dclip.shape[0]
    tri = jnp.maximum(bins, 0)
    vids = jnp.where((bins >= 0)[..., None], faces[tri], n_verts)  # (C,TY,TX,cap,3)

    flat_ids = vids.reshape(C, -1)                        # (C, S*3)
    flat_dclip = dclip.reshape(C, -1, 4)
    dv = jax.vmap(lambda d, i: segment_fn(d, i, n_verts + 1))(flat_dclip, flat_ids)
    dv = dv[:, :n_verts]                                  # (C, V, 4)

    flat_dA = dA.reshape(-1, 3)
    da = segment_fn(flat_dA, vids.reshape(-1), n_verts + 1)[:n_verts]
    return dv, da


# ---------------------------------------------------------------------------
# render_core: differentiable fused rasterize+interpolate
# ---------------------------------------------------------------------------

def make_render_core(faces, opp, resolution, cap=768, chunk=8):
    """Build the fused differentiable rasterize+interpolate op for one
    topology epoch.

    Returns ``core(v_clip (C,V,4), attrs (V,3)) -> (rast (C,H,W,4), slot
    (C,H,W), color (C,H,W,3))`` with nvdiffrast channel conventions
    (u, v, z/w, fid).  Gradients flow to v_clip (through u, v and color) and
    attrs (through color); z/fid/slot are non-differentiable, matching
    nvdiffrast.  faces/opp are per-epoch constants closed over (a jnp-traced
    topology would defeat binning's static shapes).
    """
    height, width = resolution
    # Keep topology as HOST numpy constants in the closure: building the op
    # under one jit trace and calling it under another (or eagerly) must not
    # leak tracers.  numpy constants are re-lifted freshly into every trace;
    # jnp conversion happens inside the traced functions where needed.
    fj = np.ascontiguousarray(np.asarray(faces), dtype=np.int32)
    oj = np.ascontiguousarray(np.asarray(opp), dtype=np.int32)

    inc_cache = {}

    def _inc(n_verts):
        if n_verts not in inc_cache:
            inc_cache[n_verts] = build_incidence(fj, n_verts)
        return inc_cache[n_verts]

    @jax.custom_vjp
    def core(v_clip, attrs):
        out, _ = core_fwd(v_clip, attrs)
        return out

    def core_fwd(v_clip, attrs):
        rfb, rbb, bins, counts = _setup_and_bin(v_clip, fj, attrs, oj,
                                                height, width, cap)
        u, v, z, fid, slot, c0, c1, c2 = raster_fwd_pallas(
            rfb, counts, resolution, cap, chunk)
        rast = jnp.stack([u, v, z, fid], axis=-1)
        color = jnp.stack([c0, c1, c2], axis=-1)
        res = (rbb, bins, counts, slot, v_clip.shape[1])
        return (rast, slot, color), res

    def core_bwd(res, g):
        d_rast, _, d_color = g
        rbb, bins, counts, slot, n_verts = res
        dslot = raster_bwd_pallas(rbb, counts, slot, d_color,
                                  d_rast[..., 0], d_rast[..., 1],
                                  resolution, cap, chunk)
        table18 = _chain_planes(dslot, None, 0.0, rbb)
        dv_clip, d_attrs = _scatter_via_faces(table18, bins, _inc(n_verts),
                                              fj.shape[0], n_verts)
        return dv_clip, d_attrs

    core.defvjp(core_fwd, core_bwd)
    return core


def render_core(v_clip, attrs, faces, opp, resolution, cap=768, chunk=8):
    """One-shot convenience wrapper around :func:`make_render_core`."""
    return make_render_core(faces, opp, resolution, cap, chunk)(v_clip, attrs)


# ---------------------------------------------------------------------------
# Antialias kernels (nvdiffrast dr.antialias semantics, SURVEY N1; used at
# scripts/render.py:216,220)
# ---------------------------------------------------------------------------
# For each adjacent pixel pair (horizontal and vertical) whose triangle ids
# differ, find the first silhouette edge of the nearer triangle crossing the
# segment between the pixel centers; blend color across the pair by the
# crossing parameter t.  Pairs are anchored at the left/top pixel; the
# correction to the right/bottom pixel exits the kernel as an unshifted
# delta_b plane that XLA shifts by one pixel and adds (this keeps the kernel
# free of cross-tile spills).  The oracle is antialias.antialias_dense.
#
# Discrete choices (which pair, edge, owner) follow the oracle's stop-grad
# placement: only the crossing parameter t is differentiable, through the
# edge functions ea/eb, to the two edge endpoints' screen coordinates.

def _aa_fields(f):
    """The 9 owner planes _aa_pair_t consumes, sliced from a gathered SLIM
    field block (16, P): sx0 sy0 sx1 sy1 sx2 sy2 opp1 opp2 opp3 (see
    _aa_slim_recT — the AA kernels gather only the 10 rec_bwd rows they
    use, halving the one-hot gather matmuls vs the full 32-row record)."""
    return [f[0:1], f[1:2], f[2:3], f[3:4], f[4:5], f[5:6],
            f[7:8], f[8:9], f[9:10]]


def _aa_slim_recT(rec_bwd_b):
    """(C,TY,TX,cap,32) → slim transposed records (C,TY,TX,16,cap): the 12
    rec_bwd rows the AA kernels use — sx/sy ×3 (9..14), fid (22),
    opp ×3 (23..25), ymin/ymax (26..27) — zero-padded to 16 sublanes.
    Built from two contiguous static slices (an index-array gather here
    lowers to a per-element XLA gather and costs ~15 ms at 13×256²)."""
    slim = jnp.concatenate(
        [rec_bwd_b[..., 9:15], rec_bwd_b[..., 22:28]], axis=-1)
    slimT = jnp.swapaxes(slim, -1, -2)                # (..., 12, cap)
    pad = [(0, 0)] * (slimT.ndim - 2) + [(0, 4), (0, 0)]
    return jnp.pad(slimT, pad)


def _aa_ytbl(rec_bwd_b):
    """Per-chunk y-window table for the band-windowed AA helpers:
    (C, TY, TX, 2, nch_pad) f32 with row 0 = running max of chunk ymax and
    row 1 = chunk min ymin (+BIG padding so padded lanes never qualify)."""
    cap = rec_bwd_b.shape[-2]
    nch = cap // _OH
    lead = rec_bwd_b.shape[:-2]
    ymin = rec_bwd_b[..., 26].reshape(*lead, nch, _OH)
    ymax = rec_bwd_b[..., 27].reshape(*lead, nch, _OH)
    # dead slots are zeroed rows: ymin 0 would drag chunk minima to 0 and
    # defeat the tail cut, so mask them to +BIG (ymax 0 is harmless in max)
    dead = rec_bwd_b[..., 22].reshape(*lead, nch, _OH) == 0.0   # fid row
    ymin_c = jnp.where(dead, _BIG, ymin).min(axis=-1)
    ymax_c = ymax.max(axis=-1)
    runmax = jax.lax.cummax(ymax_c, axis=ymax_c.ndim - 1)
    tbl = jnp.stack([runmax, ymin_c], axis=-2)        # (..., 2, nch)
    pad_n = (-nch) % 128
    if pad_n:
        tbl = jnp.pad(tbl, [(0, 0)] * (tbl.ndim - 1) + [(0, pad_n)],
                      constant_values=_BIG)
    return tbl


def _aa_pair_t(fields, pax, pay, d_ex, d_ey, other_fid):
    """Dense crossing-parameter math for one pair direction.

    fields: 9 per-pixel owner planes (sx0 sy0 sx1 sy1 sx2 sy2 opp1 opp2 opp3);
    (pax, pay) anchor pixel centers; (d_ex, d_ey) the NDC offset to the pair
    neighbor.  Returns (t, found, dt_to_endpoints-callback inputs):
    per-pixel (t, found, per-edge take masks and ea/eb/denoms for bwd reuse).
    """
    sxs = (fields[0], fields[2], fields[4])
    sys_ = (fields[1], fields[3], fields[5])
    opps = (fields[6], fields[7], fields[8])
    best_t = jnp.zeros_like(pax)
    found = jnp.zeros_like(pax, dtype=jnp.bool_)
    takes, geos = [], []
    for e in range(3):
        ax, ay = sxs[e], sys_[e]
        bx, by = sxs[(e + 1) % 3], sys_[(e + 1) % 3]
        ex, ey = bx - ax, by - ay
        ea = ex * (pay - ay) - ey * (pax - ax)
        # evaluate eb directly at the neighbor pixel (not incrementally from
        # ea) so the crossing parameter t rounds identically to the oracle's
        # formulation (antialias._pair_corrections)
        eb = ex * (pay + d_ey - ay) - ey * (pax + d_ex - ax)
        separates = (ea > 0.0) != (eb > 0.0)
        denom = ea - eb
        safe_den = jnp.where(denom == 0.0, 1.0, denom)
        t = ea / safe_den
        cx = pax + t * d_ex
        cy = pay + t * d_ey
        along = (cx - ax) * ex + (cy - ay) * ey
        within = (along >= 0.0) & (along <= ex * ex + ey * ey)
        silhouette = (other_fid == 0.0) | (opps[e] != other_fid)
        valid = separates & within & silhouette
        take = valid & ~found
        best_t = jnp.where(take, t, best_t)
        found = found | valid
        takes.append(take)
        geos.append((ea, eb, safe_den, ax, ay, bx, by))
    return best_t, found, takes, geos


def _aa_common(fid, z, fid_n, z_n):
    """Owner/other ids for one pair direction (bg depth = +inf)."""
    da = jnp.where(fid > 0.0, z, _BIG)
    db = jnp.where(fid_n > 0.0, z_n, _BIG)
    owner_is_a = da <= db
    owner = jnp.where(owner_is_a, fid, fid_n)
    other = jnp.where(owner_is_a, fid_n, fid)
    differs = fid != fid_n
    return owner, other, differs


def _aa_fwd_kernel(counts_ref, row0_ref, rec_ref, recT_ref, ytbl_ref,
                   fid_ref, z_ref, fidr_ref, zr_ref, fidd_ref, zd_ref,
                   *rest, cap, chunk, height, width, D):
    col_refs = rest[:D]
    colr_refs = rest[D:2 * D]
    cold_refs = rest[2 * D:3 * D]
    out_refs = rest[3 * D:4 * D]
    dbh_refs = rest[4 * D:5 * D]
    dbv_refs = rest[5 * D:6 * D]
    facc = rest[6 * D]

    ci = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    count = counts_ref[ci, ti, tj]
    tile_y0 = ((ti + row0_ref[0]) * TILE_H).astype(jnp.float32)
    pax, pay = _pixel_lanes(ti + row0_ref[0], tj, height, width)
    dxw = 2.0 / width
    dyh = 2.0 / height
    shape2d = (TILE_H, TILE_W)

    fid = fid_ref[0].reshape(1, _P)
    z = z_ref[0].reshape(1, _P)
    own_h, oth_h, dif_h = _aa_common(fid, z, fidr_ref[0].reshape(1, _P),
                                     zr_ref[0].reshape(1, _P))
    own_v, oth_v, dif_v = _aa_common(fid, z, fidd_ref[0].reshape(1, _P),
                                     zd_ref[0].reshape(1, _P))
    if cap <= _UNROLL_CAP:
        fid_col = rec_ref[0, 0, 0][:, 22:23]                   # (cap, 1)

    results = []
    for own, oth, d_ex, d_ey in ((own_h, oth_h, dxw, 0.0),
                                 (own_v, oth_v, 0.0, dyh)):
        if cap > _UNROLL_CAP:
            _onehot_gather_bykey_ref(recT_ref, (0, 0, 0), own, count, facc,
                                     tbl=ytbl_ref[0, 0, 0],
                                     tile_y0=tile_y0)
        else:
            _onehot_gather_bykey(recT_ref[0, 0, 0], fid_col, own, cap, count,
                                 facc)
        t, found, _, _ = _aa_pair_t(_aa_fields(facc[...]),
                                    pax, pay, d_ex, d_ey, oth)
        results.append((t, found))
    (t_h, found_h), (t_v, found_v) = results

    act_h = dif_h & (own_h > 0.0) & found_h
    act_v = dif_v & (own_v > 0.0) & found_v
    wa_h = jnp.where(act_h & (t_h < 0.5), 0.5 - t_h, 0.0)
    wb_h = jnp.where(act_h & (t_h >= 0.5), t_h - 0.5, 0.0)
    wa_v = jnp.where(act_v & (t_v < 0.5), 0.5 - t_v, 0.0)
    wb_v = jnp.where(act_v & (t_v >= 0.5), t_v - 0.5, 0.0)

    for c in range(D):
        col = col_refs[c][0].reshape(1, _P)
        dh = colr_refs[c][0].reshape(1, _P) - col
        dv_ = cold_refs[c][0].reshape(1, _P) - col
        out_refs[c][0] = (col + wa_h * dh + wa_v * dv_).reshape(shape2d)
        dbh_refs[c][0] = (-wb_h * dh).reshape(shape2d)
        dbv_refs[c][0] = (-wb_v * dv_).reshape(shape2d)


def _plane_spec():
    return pl.BlockSpec((1, TILE_H, TILE_W),
                        lambda c, i, j, counts, row0: (c, i, j),
                        memory_space=pltpu.VMEM)


def _shift_left(x):
    """Right-neighbor value (edge-replicated): works on (C, H, W[, D])."""
    return jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)


def _shift_up(x):
    """Down-neighbor value (edge-replicated; row 0 is the image bottom)."""
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _shift_right_ch(x):
    """Push values one pixel toward larger column index (zero fill)."""
    return jnp.concatenate([jnp.zeros_like(x[:, :, :1]), x[:, :, :-1]], axis=2)


# --- halo-aware row shifts for 'sp' image-row sharding -------------------
# Under shard_map with the image H dimension sharded, vertical antialias
# pairs cross shard boundaries: the down-neighbor of a shard's last row is
# the NEXT shard's first row, and the shifted-down correction plane's last
# row belongs to the next shard's first row.  One-row ppermute halos keep
# the kernels themselves shard-oblivious.

def _shift_up_halo(x, axis, sp):
    """Down-neighbor values (global edge-replicated) across row shards."""
    nxt = jax.lax.ppermute(x[:, :1], axis,
                           [(s, s - 1) for s in range(1, sp)])
    idx = jax.lax.axis_index(axis)
    edge = jnp.where(idx == sp - 1, x[:, -1:], nxt)
    return jnp.concatenate([x[:, 1:], edge], axis=1)


def _shift_down_ch_halo(x, axis, sp):
    """Push one row toward larger row index across shards (zero fill at
    the global top; ppermute zero-fills the unaddressed first shard)."""
    prev = jax.lax.ppermute(x[:, -1:], axis,
                            [(s, s + 1) for s in range(sp - 1)])
    return jnp.concatenate([prev, x[:, :-1]], axis=1)


def _shift_down_ch(x):
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


@partial(jax.jit, static_argnames=("resolution", "cap", "chunk", "D", "interpret", "halo"))
def aa_fwd_pallas(rec_bwd_b, counts_b, fid, z, color, resolution, cap,
                  chunk=8, D=4, interpret=None, row0=None, halo=None):
    """Antialias forward.  color (C, H, W, D) -> antialiased (C, H, W, D).

    The last row/column pairs wrap onto themselves via edge-replicated
    shifts; replicated neighbors never differ, so no spurious pairs arise
    (the image boundary has no pair partner, as in the oracle)."""
    height, width = resolution
    if interpret is None:
        interpret = _interpret()
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    C, ty, tx = counts_b.shape
    recT = _aa_slim_recT(rec_bwd_b)
    # large caps: the kernel keys gathers off slim row 6 (fid), so the
    # (cap, 32) record block — 27 MB of VMEM per buffer at 163k-vert caps —
    # is replaced by an 8x128 dummy
    big = cap > _UNROLL_CAP
    rec_in = jnp.zeros((C, 1, 1, 8, 128), jnp.float32) if big else rec_bwd_b
    rec_spec = pl.BlockSpec(
        (1, 1, 1, 8, 128), lambda c, i, j, counts, row0: (c, 0, 0, 0, 0),
        memory_space=pltpu.VMEM) if big else pl.BlockSpec(
        (1, 1, 1, cap, 32), lambda c, i, j, counts, row0: (c, i, j, 0, 0),
        memory_space=pltpu.VMEM)
    up = (lambda x: _shift_up_halo(x, *halo)) if halo else _shift_up
    fid_r, z_r = _shift_left(fid), _shift_left(z)
    fid_d, z_d = up(fid), up(z)
    col_r = _shift_left(color)
    col_d = up(color)

    kernel = partial(_aa_fwd_kernel, cap=cap, chunk=chunk,
                     height=height, width=width, D=D)
    n_in_planes = 6 + 3 * D
    n_out = 3 * D
    ytbl = _aa_ytbl(rec_bwd_b) if big else jnp.zeros(
        (C, 1, 1, 2, 128), jnp.float32)
    ytbl_spec = pl.BlockSpec(
        (1, 1, 1, 2, ytbl.shape[-1]),
        (lambda c, i, j, counts, row0: (c, i, j, 0, 0)) if big
        else (lambda c, i, j, counts, row0: (c, 0, 0, 0, 0)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, ty, tx),
        in_specs=[rec_spec,
                  pl.BlockSpec((1, 1, 1, 16, cap),
                               lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  ytbl_spec]
        + [_plane_spec()] * n_in_planes,
        out_specs=[_plane_spec()] * n_out,
        scratch_shapes=[pltpu.VMEM((16, _P), jnp.float32)],
    )
    chans = lambda a: [a[..., c] for c in range(D)]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, ty * TILE_H, width),
                                        jnp.float32)] * n_out,
        interpret=interpret, **_ccall_kwargs(cap),
    )(counts_b, row0, rec_in, recT, ytbl, fid, z, fid_r, z_r, fid_d, z_d,
      *chans(color), *chans(col_r), *chans(col_d))
    down = (lambda x: _shift_down_ch_halo(x, *halo)) if halo \
        else _shift_down_ch
    out = jnp.stack(outs[:D], axis=-1)
    db_h = jnp.stack(outs[D:2 * D], axis=-1)
    db_v = jnp.stack(outs[2 * D:], axis=-1)
    return out + _shift_right_ch(db_h) + down(db_v)




def _aa_bwd_kernel(counts_ref, row0_ref, rec_ref, recT_ref, ytbl_ref,
                   fid_ref, z_ref, fidr_ref, zr_ref, fidd_ref, zd_ref,
                   *rest, cap, chunk, height, width, D):
    col_refs = rest[:D]
    colr_refs = rest[D:2 * D]
    cold_refs = rest[2 * D:3 * D]
    dout_refs = rest[3 * D:4 * D]
    doutr_refs = rest[4 * D:5 * D]
    doutd_refs = rest[5 * D:6 * D]
    dcol_refs = rest[6 * D:7 * D]
    dbh_refs = rest[7 * D:8 * D]
    dbv_refs = rest[8 * D:9 * D]
    dslot_ref = rest[9 * D]
    facc, S0, S1 = rest[9 * D + 1], rest[9 * D + 2], rest[9 * D + 3]

    ci = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    count = counts_ref[ci, ti, tj]
    tile_y0 = ((ti + row0_ref[0]) * TILE_H).astype(jnp.float32)
    pax, pay = _pixel_lanes(ti + row0_ref[0], tj, height, width)
    dxw = 2.0 / width
    dyh = 2.0 / height
    shape2d = (TILE_H, TILE_W)

    fid = fid_ref[0].reshape(1, _P)
    z = z_ref[0].reshape(1, _P)
    own_h, oth_h, dif_h = _aa_common(fid, z, fidr_ref[0].reshape(1, _P),
                                     zr_ref[0].reshape(1, _P))
    own_v, oth_v, dif_v = _aa_common(fid, z, fidd_ref[0].reshape(1, _P),
                                     zd_ref[0].reshape(1, _P))
    if cap <= _UNROLL_CAP:
        fid_col = rec_ref[0, 0, 0][:, 22:23]                   # (cap, 1)

    dcol_acc = [jnp.zeros((1, _P), jnp.float32) for _ in range(D)]

    for direction, (oth, dif, own, d_ex, d_ey, coln_refs, doutn_refs,
                    dcolb_refs) in enumerate((
            (oth_h, dif_h, own_h, dxw, 0.0, colr_refs, doutr_refs, dbh_refs),
            (oth_v, dif_v, own_v, 0.0, dyh, cold_refs, doutd_refs,
             dbv_refs))):
        if cap > _UNROLL_CAP:
            _onehot_gather_bykey_ref(recT_ref, (0, 0, 0), own, count, facc,
                                     tbl=ytbl_ref[0, 0, 0],
                                     tile_y0=tile_y0)
        else:
            _onehot_gather_bykey(recT_ref[0, 0, 0], fid_col, own, cap, count,
                                 facc)
        fvals = _aa_fields(facc[...])
        t, found, takes, geos = _aa_pair_t(fvals, pax, pay, d_ex, d_ey, oth)
        act = dif & (own > 0.0) & found
        lo = act & (t < 0.5)
        hi = act & (t >= 0.5)
        wa = jnp.where(lo, 0.5 - t, 0.0)
        wb = jnp.where(hi, t - 0.5, 0.0)
        # color gradients
        dt = jnp.zeros_like(t)
        for c in range(D):
            diff = coln_refs[c][0].reshape(1, _P) - col_refs[c][0].reshape(1, _P)
            dout = dout_refs[c][0].reshape(1, _P)
            doutn = doutn_refs[c][0].reshape(1, _P)
            dcol_acc[c] = dcol_acc[c] - wa * dout + wb * doutn
            dcolb_refs[c][0] = (wa * dout - wb * doutn).reshape(shape2d)
            dt = dt - diff * jnp.where(lo, dout, jnp.where(hi, doutn, 0.0))
        # t -> edge endpoints (only the winning edge's take mask is set)
        pbx = pax + d_ex
        pby = pay + d_ey
        dsx = [jnp.zeros((1, _P), jnp.float32) for _ in range(3)]
        dsy = [jnp.zeros((1, _P), jnp.float32) for _ in range(3)]
        for e in range(3):
            take = takes[e]
            ea, eb, den, ax, ay, bx, by = geos[e]
            dtm = jnp.where(take, dt, 0.0)
            inv_d2 = 1.0 / (den * den)
            # sliver triangles make den ~ 0 and 1/den² overflows to inf;
            # one inf gradient component NaNs the whole parameter vector
            # through AdamUniform's global-max denominator (observed at
            # step 151 of a 2170-step nefertiti run).  nvdiffrast skips
            # ill-conditioned crossings; zero the non-finite contributions
            # (abs(x) < _BIG is False for both inf and NaN).
            sane = lambda x: jnp.where(jnp.abs(x) < _BIG, x, 0.0)
            dea = sane(dtm * (-eb) * inv_d2)
            deb = sane(dtm * ea * inv_d2)
            dax = dea * (by - pay) + deb * (by - pby)
            day = dea * (pax - bx) + deb * (pbx - bx)
            dbx = dea * (pay - ay) + deb * (pby - ay)
            dby = dea * (ax - pax) + deb * (ax - pbx)
            j0, j1 = e, (e + 1) % 3
            dsx[j0] = dsx[j0] + dax
            dsy[j0] = dsy[j0] + day
            dsx[j1] = dsx[j1] + dbx
            dsy[j1] = dsy[j1] + dby

        # per-slot endpoint sums, keyed by this direction's owner face id
        G = jnp.concatenate(
            (dsx[0], dsy[0], dsx[1], dsy[1], dsx[2], dsy[2]), axis=0)
        if cap > _UNROLL_CAP:
            _onehot_reduce_bykey_add(dslot_ref, recT_ref, (0, 0, 0), own, G,
                                     count, init=(direction == 0),
                                     tbl=ytbl_ref[0, 0, 0],
                                     tile_y0=tile_y0)
        else:
            _onehot_reduce(S0 if direction == 0 else S1, fid_col, own, G,
                           cap, count)

    for c in range(D):
        dcol_refs[c][0] = dcol_acc[c].reshape(shape2d)
    if cap <= _UNROLL_CAP:
        # single output write — no read-modify-write across direction passes
        dslot_ref[0, 0, 0] = (S0[...] + S1[...])[:, :8]


@partial(jax.jit, static_argnames=("resolution", "cap", "chunk", "D", "interpret", "halo"))
def aa_bwd_pallas(rec_bwd_b, counts_b, fid, z, color, d_out, resolution, cap,
                  chunk=8, D=4, interpret=None, row0=None, halo=None):
    """Antialias backward.

    Returns (d_color (C, H, W, D), dslot_aa (C, TY, TX, cap, 8) whose first
    6 columns are [dsx0 dsy0 dsx1 dsy1 dsx2 dsy2] per owner slot)."""
    height, width = resolution
    if interpret is None:
        interpret = _interpret()
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    C, ty, tx = counts_b.shape
    recT = _aa_slim_recT(rec_bwd_b)
    big = cap > _UNROLL_CAP
    rec_in = jnp.zeros((C, 1, 1, 8, 128), jnp.float32) if big else rec_bwd_b
    rec_spec = pl.BlockSpec(
        (1, 1, 1, 8, 128), lambda c, i, j, counts, row0: (c, 0, 0, 0, 0),
        memory_space=pltpu.VMEM) if big else pl.BlockSpec(
        (1, 1, 1, cap, 32), lambda c, i, j, counts, row0: (c, i, j, 0, 0),
        memory_space=pltpu.VMEM)
    up = (lambda x: _shift_up_halo(x, *halo)) if halo else _shift_up
    fid_r, z_r = _shift_left(fid), _shift_left(z)
    fid_d, z_d = up(fid), up(z)
    col_r = _shift_left(color)
    col_d = up(color)
    dout_r = _shift_left(d_out)
    dout_d = up(d_out)

    kernel = partial(_aa_bwd_kernel, cap=cap, chunk=chunk,
                     height=height, width=width, D=D)
    n_in_planes = 6 + 6 * D
    ytbl = _aa_ytbl(rec_bwd_b) if big else jnp.zeros(
        (C, 1, 1, 2, 128), jnp.float32)
    ytbl_spec = pl.BlockSpec(
        (1, 1, 1, 2, ytbl.shape[-1]),
        (lambda c, i, j, counts, row0: (c, i, j, 0, 0)) if big
        else (lambda c, i, j, counts, row0: (c, 0, 0, 0, 0)),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, ty, tx),
        in_specs=[rec_spec,
                  pl.BlockSpec((1, 1, 1, 16, cap),
                               lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  ytbl_spec]
        + [_plane_spec()] * n_in_planes,
        out_specs=[_plane_spec()] * (3 * D)
        + [pl.BlockSpec((1, 1, 1, cap, 8),
                        lambda c, i, j, counts, row0: (c, i, j, 0, 0),
                        memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((16, _P), jnp.float32),
                        pltpu.VMEM((min(cap, _UNROLL_CAP), 128), jnp.float32),
                        pltpu.VMEM((min(cap, _UNROLL_CAP), 128), jnp.float32)],
    )
    chans = lambda a: [a[..., c] for c in range(D)]
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, ty * TILE_H, width),
                                        jnp.float32)] * (3 * D)
        + [jax.ShapeDtypeStruct((C, ty, tx, cap, 8), jnp.float32)],
        interpret=interpret, **_ccall_kwargs(cap),
    )(counts_b, row0, rec_in, recT, ytbl, fid, z, fid_r, z_r, fid_d, z_d,
      *chans(color), *chans(col_r), *chans(col_d),
      *chans(d_out), *chans(dout_r), *chans(dout_d))
    down = (lambda x: _shift_down_ch_halo(x, *halo)) if halo \
        else _shift_down_ch
    dcol = jnp.stack(outs[:D], axis=-1) + d_out
    db_h = jnp.stack(outs[D:2 * D], axis=-1)
    db_v = jnp.stack(outs[2 * D:3 * D], axis=-1)
    dcol = dcol + _shift_right_ch(db_h) + down(db_v)
    return dcol, outs[3 * D]


# ---------------------------------------------------------------------------
# render_pipeline: the full shaded/silhouette render as one custom-VJP op
# ---------------------------------------------------------------------------
# Mirrors NVDRenderer.render's per-frame pipeline (scripts/render.py:204-220):
# rasterize -> interpolate -> (composite over background) -> antialias, with
# pos_gradient_boost multiplying exactly the antialias position gradients.
# One custom_vjp wraps the whole chain so the triangle bins, rec tables and
# slot map are computed once and shared between the forward and backward
# kernels.

def _setup_prebinned(v_clip, faces, attrs, opp, bins, counts, height, width):
    """Binned-layout record build from precomputed (host) bins.

    bins (C, T, cap) int32 (-1 padding), counts (C, T) — T may be a LOCAL
    tile-row slice under 'sp' row sharding (ty is derived from T).  Returns
    the same (rfb, rbb, bins, counts) 4-tuple as _setup_and_bin."""
    tx = width // TILE_W
    ty = bins.shape[1] // tx
    C = v_clip.shape[0]
    cap = bins.shape[-1]
    rfb, rbb = jax.vmap(
        lambda vc, b: setup_from_bins(vc, faces, attrs, opp, b, height, width)
    )(v_clip, bins)
    return (rfb.reshape(C, ty, tx, cap, 32), rbb.reshape(C, ty, tx, cap, 32),
            bins.reshape(C, ty, tx, cap),
            counts.reshape(C, ty, tx).astype(jnp.int32))


def _slice_bin_rows(bins, counts, r0t, ty_local, tx):
    """Slice full-image host bins (C, TY·TX, cap)/(C, TY·TX) down to the
    local ``ty_local`` tile rows starting at traced tile-row ``r0t`` (the
    'sp' row-sharding path: bins stay replicated across the row axis and
    each device takes its slice in-graph)."""
    C, T, cap = bins.shape
    ty_full = T // tx
    b4 = jax.lax.dynamic_slice_in_dim(
        bins.reshape(C, ty_full, tx, cap), r0t, ty_local, axis=1)
    c3 = jax.lax.dynamic_slice_in_dim(
        counts.reshape(C, ty_full, tx), r0t, ty_local, axis=1)
    return b4.reshape(C, ty_local * tx, cap), c3.reshape(C, ty_local * tx)


def make_render_pipeline(faces, opp, resolution, shading=True, boost=1.0,
                         cap=768, ablate="", prebinned=False,
                         row_shards=1, row_axis=None, slots_k=None):
    """Build the full fused render op for one topology epoch.

    Mirrors NVDRenderer.render (scripts/render.py:204-220): rasterize ->
    interpolate -> (composite over background) -> antialias, with
    ``pos_gradient_boost`` multiplying exactly the antialias position
    gradients.  Returns ``pipe(v_clip (C,V,4), attrs (V,3), bg) ->
    (C,H,W,4)`` shaded images (or ``(C,H,W,3)`` with shading=False; pass
    bg=None).  One custom_vjp wraps the chain so bins, rec tables and the
    slot map are shared between forward and backward kernels.

    With ``row_shards=sp > 1`` (and ``row_axis`` the mesh axis name) the
    pipe is built for ONE image-row shard under ``shard_map``: each device
    bins and rasterizes only its ``TY/sp`` tile rows of every camera, and
    the antialias pass exchanges one-row halos over ``row_axis`` (vertical
    silhouette pairs cross shard boundaries).  Outputs are the local
    (C, H/sp, W, D) row slice.

    With ``prebinned=True`` the op signature becomes
    ``pipe(v_clip, attrs, bg, bins (C,T,cap) int32, counts (C,T))`` and the
    (expensive at large F) traced binning is skipped: the driver computes
    bins on host every few steps with a bbox margin
    (:func:`bin_triangles_host`) and threads them in as device arguments.
    With ``slots_k=K`` (prebinned, unsharded only) the signature gains a
    trailing ``fslots (C, F+1, K)`` argument and the backward's slot→face
    reduction runs as a gather (:func:`_scatter_via_slots`).
    """
    height, width = resolution
    # numpy (not jnp) closures: trace-safe — see make_render_core
    fj = np.ascontiguousarray(np.asarray(faces), dtype=np.int32)
    oj = np.ascontiguousarray(np.asarray(opp), dtype=np.int32)
    D = 4 if shading else 3
    inc_cache = {}
    halo = None
    if row_shards > 1:
        ty_full = height // TILE_H
        if ty_full % row_shards:
            raise ValueError(f"{ty_full} tile rows not divisible by "
                             f"row_shards={row_shards}")
        ty_local = ty_full // row_shards
        halo = (row_axis, row_shards)

    def _row_ctx():
        """(ty_range for binning, (1,) row0 operand for the kernels)."""
        if row_shards <= 1:
            return None, None
        r0t = jax.lax.axis_index(row_axis) * ty_local
        return (r0t, ty_local), jnp.reshape(r0t.astype(jnp.int32), (1,))

    def _inc(n_verts):
        if n_verts not in inc_cache:
            inc_cache[n_verts] = build_incidence(fj, n_verts)
        return inc_cache[n_verts]

    def fwd_common(v_clip, attrs, bg, rfb, rbb, bins, counts):
        _, row0 = _row_ctx()
        # chunk=128: 2x fwd throughput vs 32 at suzanne-class (measured
        # 13.3/11.7/6.7 ms at chunk 8/32/128) — the traced bins are
        # ymin-sorted so wide chunks stay band-coherent
        u, v, z, fid, slot, c0, c1, c2 = raster_fwd_pallas(
            rfb, counts, resolution, cap, chunk=128, row0=row0)
        color = jnp.stack([c0, c1, c2], axis=-1)
        cov = (fid > 0.0)[..., None]
        if shading:
            col4 = jnp.concatenate([color, cov.astype(color.dtype)], axis=-1)
            comp = jnp.where(cov, col4, bg)
        else:
            comp = color
        out = aa_fwd_pallas(rbb, counts, fid, z, comp, resolution, cap, D=D,
                            row0=row0, halo=halo)
        res = (rbb, bins, counts, slot, fid, z, comp, cov, v_clip.shape[1],
               None if bg is None else bg.shape)
        return out, res

    if prebinned and slots_k is not None:
        if row_shards > 1:
            raise ValueError("slots_k gather-scatter is unsharded-only")

        @jax.custom_vjp
        def pipe(v_clip, attrs, bg, bins, counts, fslots):
            out, _ = pipe_fwd(v_clip, attrs, bg, bins, counts, fslots)
            return out

        def pipe_fwd(v_clip, attrs, bg, bins, counts, fslots):
            rfb, rbb, bins4, counts3 = _setup_prebinned(
                v_clip, fj, attrs, oj, bins, counts, height, width)
            out, res = fwd_common(v_clip, attrs, bg, rfb, rbb, bins4, counts3)
            return out, res + (bins.shape, counts.shape, fslots)
    elif prebinned:
        @jax.custom_vjp
        def pipe(v_clip, attrs, bg, bins, counts):
            out, _ = pipe_fwd(v_clip, attrs, bg, bins, counts)
            return out

        def pipe_fwd(v_clip, attrs, bg, bins, counts):
            bins_l, counts_l = bins, counts
            if row_shards > 1:
                (r0t, tyl), _ = _row_ctx()
                bins_l, counts_l = _slice_bin_rows(bins, counts, r0t, tyl,
                                                   width // TILE_W)
            rfb, rbb, bins4, counts3 = _setup_prebinned(
                v_clip, fj, attrs, oj, bins_l, counts_l, height, width)
            out, res = fwd_common(v_clip, attrs, bg, rfb, rbb, bins4, counts3)
            return out, res + (bins.shape, counts.shape)
    else:
        @jax.custom_vjp
        def pipe(v_clip, attrs, bg):
            out, _ = pipe_fwd(v_clip, attrs, bg)
            return out

        def pipe_fwd(v_clip, attrs, bg):
            ty_range, _ = _row_ctx()
            rfb, rbb, bins, counts = _setup_and_bin(v_clip, fj, attrs, oj,
                                                    height, width, cap,
                                                    ty_range)
            return fwd_common(v_clip, attrs, bg, rfb, rbb, bins, counts)

    def pipe_bwd(res, g):
        # ``ablate`` is an explicit constructor argument used only by
        # benchmarks/ablate_pipe.py to zero one backward stage at a time;
        # the production path always builds with ablate="" (no env knobs —
        # a leaked variable must not silently corrupt gradients)
        (rbb, bins, counts, slot, fid, z, comp, cov, n_verts,
         bg_shape) = res[:10]
        _, row0 = _row_ctx()
        if "aabwd" in ablate:
            d_comp, dslot_aa = g, jnp.zeros(
                (*counts.shape, cap, 8), jnp.float32)
        else:
            d_comp, dslot_aa = aa_bwd_pallas(rbb, counts, fid, z, comp, g,
                                             resolution, cap, D=D,
                                             row0=row0, halo=halo)
        if shading:
            d_color = jnp.where(cov, d_comp[..., :3], 0.0)
        else:
            d_color = d_comp
        if "rbwd" in ablate:
            dslot = jnp.zeros((*counts.shape, cap, 32), jnp.float32)
        else:
            dslot = raster_bwd_pallas(rbb, counts, slot, d_color,
                                      jnp.zeros_like(fid),
                                      jnp.zeros_like(fid),
                                      resolution, cap, row0=row0)
        # combine raster + (boosted) antialias screen-space sums and chain
        # to clip space in one planar pass
        table18 = _chain_planes(dslot, dslot_aa, boost, rbb)
        if "scatter" in ablate:
            dv_clip = jnp.zeros((counts.shape[0], n_verts, 4), jnp.float32) \
                + table18.sum() * 0
            d_attrs = jnp.zeros((n_verts, 3), jnp.float32)
        elif prebinned and slots_k is not None:
            dv_clip, d_attrs = _scatter_via_slots(table18, res[12],
                                                  _inc(n_verts), n_verts)
        else:
            dv_clip, d_attrs = _scatter_via_faces(table18, bins,
                                                  _inc(n_verts),
                                                  fj.shape[0], n_verts)
        # bg cotangent: comp = where(cov, col4, bg), so d_bg is d_comp over
        # uncovered pixels (the antialias blend contribution is already part
        # of d_comp).  The reference treats bgs as a non-trained buffer, but
        # the gradient is exact if anyone differentiates w.r.t. the envmap.
        if bg_shape is None:
            d_bg = None
        else:
            d_bg = jnp.where(cov, 0.0, d_comp)
            extra = d_bg.ndim - len(bg_shape)
            if extra:
                d_bg = d_bg.sum(axis=tuple(range(extra)))
        if prebinned:
            bins_shape, counts_shape = res[10], res[11]
            zb = np.zeros(bins_shape, jax.dtypes.float0)
            zc = np.zeros(counts_shape, jax.dtypes.float0)
            if slots_k is not None:
                return (dv_clip, d_attrs, d_bg, zb, zc,
                        np.zeros(res[12].shape, jax.dtypes.float0))
            return (dv_clip, d_attrs, d_bg, zb, zc)
        return dv_clip, d_attrs, d_bg

    pipe.defvjp(pipe_fwd, pipe_bwd)
    return pipe


# ---------------------------------------------------------------------------
# Large-F pipeline: camera-sequential, host-binned, memory-bounded
# ---------------------------------------------------------------------------
# At nefertiti scale (≥100k vertices, 327k faces, 13×256²) the batched
# pipeline's working set — two (C, T, cap≈40k, 32) record tables plus the
# backward's gradient table — exceeds HBM once TPU tile padding (trailing
# 32 → 128 lanes) is accounted for.  This variant processes ONE camera at a
# time through a PYTHON-UNROLLED loop (not lax.map — a loop body drops the
# kernels' vmem-limit attribute on the axon AOT path, see _ccall_kwargs);
# the "one camera's tables at a time" memory bound rests on XLA's
# liveness/buffer-reuse scheduling of the straight-line chains.  It
# recomputes the backward records instead of saving them as residuals, and
# runs the planar chain+scatter per camera.  Kernel-level code is IDENTICAL
# to the batched path (grid C=1).

def make_render_pipeline_big(faces, opp, resolution, shading=True,
                             boost=1.0, cap=8192, row_shards=1,
                             row_axis=None, slots_k=None):
    """Camera-sequential prebinned render op for the ≥100k-face regime.

    Same contract as ``make_render_pipeline(..., prebinned=True)``:
    ``pipe(v_clip (C,V,4), attrs (V,3), bg, bins (C,T,cap), counts (C,T))``.

    With ``row_shards=sp > 1`` (under ``shard_map``, ``row_axis`` the mesh
    axis name): bins/counts arrive replicated over 'sp' covering the FULL
    image; each device slices its ``TY/sp`` tile rows in-graph, renders its
    row slice of every local camera, and the antialias pass ppermutes
    one-row halos over ``row_axis``.  ``bg`` and the output are the local
    (C, H/sp, W, D) row slices.
    """
    height, width = resolution
    ty_full, tx = height // TILE_H, width // TILE_W
    fj = np.ascontiguousarray(np.asarray(faces), dtype=np.int32)
    oj = np.ascontiguousarray(np.asarray(opp), dtype=np.int32)
    D = 4 if shading else 3
    inc_cache = {}
    halo = None
    ty = ty_full
    if row_shards > 1:
        if ty_full % row_shards:
            raise ValueError(f"{ty_full} tile rows not divisible by "
                             f"row_shards={row_shards}")
        ty = ty_full // row_shards
        halo = (row_axis, row_shards)

    def _row_ctx():
        if row_shards <= 1:
            return jnp.zeros((1,), jnp.int32)
        r0t = jax.lax.axis_index(row_axis) * ty
        return jnp.reshape(r0t.astype(jnp.int32), (1,))

    def _inc(n_verts):
        if n_verts not in inc_cache:
            inc_cache[n_verts] = build_incidence(fj, n_verts)
        return inc_cache[n_verts]

    def cam_fwd(vc1, bg1, bins1, counts1, attrs, row0):
        rfb, rbb = setup_from_bins(vc1, fj, attrs, oj, bins1, height, width)
        rfb = rfb.reshape(1, ty, tx, cap, 32)
        rbb = rbb.reshape(1, ty, tx, cap, 32)
        c3 = counts1.reshape(1, ty, tx).astype(jnp.int32)
        # host bins are ymin-sorted too, so wide chunks stay band-coherent
        # (measured 17.5 -> 15.4 ms per 327k-face camera at chunk 32 -> 128)
        u, v, z, fid, slot, c0, c1, c2 = raster_fwd_pallas(
            rfb, c3, resolution, cap, chunk=128, row0=row0)
        color = jnp.stack([c0, c1, c2], axis=-1)
        cov = (fid > 0.0)[..., None]
        if shading:
            col4 = jnp.concatenate([color, cov.astype(color.dtype)], axis=-1)
            comp = jnp.where(cov, col4, bg1[None])
        else:
            comp = color
        out = aa_fwd_pallas(rbb, c3, fid, z, comp, resolution, cap, D=D,
                            row0=row0, halo=halo)
        return out[0], slot[0], fid[0], z[0], comp[0], cov[0]

    if slots_k is not None:
        if row_shards > 1:
            raise ValueError("slots_k gather-scatter is unsharded-only")

        @jax.custom_vjp
        def pipe(v_clip, attrs, bg, bins, counts, fslots):
            out, _ = pipe_fwd(v_clip, attrs, bg, bins, counts, fslots)
            return out

        def pipe_fwd(v_clip, attrs, bg, bins, counts, fslots):
            out, res = _pipe_fwd_common(v_clip, attrs, bg, bins, counts)
            return out, res + (fslots,)
    else:
        @jax.custom_vjp
        def pipe(v_clip, attrs, bg, bins, counts):
            out, _ = pipe_fwd(v_clip, attrs, bg, bins, counts)
            return out

        def pipe_fwd(v_clip, attrs, bg, bins, counts):
            return _pipe_fwd_common(v_clip, attrs, bg, bins, counts)

    def _pipe_fwd_common(v_clip, attrs, bg, bins, counts):
        row0 = _row_ctx()
        if row_shards > 1:
            bins_l, counts_l = _slice_bin_rows(
                bins, counts, row0[0], ty, tx)
        else:
            bins_l, counts_l = bins, counts
        bg_in = bg if shading else jnp.zeros(
            (v_clip.shape[0], ty * TILE_H, width, D), jnp.float32)
        # PYTHON-UNROLLED camera loop (deliberately NOT lax.map/scan): a
        # loop body silently drops the kernels' vmem-limit attribute on the
        # axon AOT path (see _ccall_kwargs), so the cameras compile as
        # straight-line kernel chains.  The "one camera's tables at a time"
        # memory bound therefore rests on XLA's liveness/buffer-reuse
        # scheduling of those chains, not on program structure.
        per_cam = [cam_fwd(v_clip[i], bg_in[i], bins_l[i], counts_l[i],
                           attrs, row0)
                   for i in range(v_clip.shape[0])]
        out, slot, fid, z, comp, cov = (
            jnp.stack([p[k] for p in per_cam]) for k in range(6))
        res = (v_clip, attrs, bins, counts, slot, fid, z, comp, cov,
               None if bg is None else bg.shape)
        return out, res

    def pipe_bwd(res, g):
        (v_clip, attrs, bins, counts, slot, fid, z, comp, cov,
         bg_shape) = res[:10]
        fslots = res[10] if slots_k is not None else None
        n_verts = v_clip.shape[1]
        row0 = _row_ctx()
        if row_shards > 1:
            bins_l, counts_l = _slice_bin_rows(
                bins, counts, row0[0], ty, tx)
        else:
            bins_l, counts_l = bins, counts

        def cam_bwd(t):
            vc1, bins1, counts1, slot1, fid1, z1, comp1, cov1, g1, fs1 = t
            _, rbb = setup_from_bins(vc1, fj, attrs, oj, bins1,
                                     height, width, need_fwd=False)
            rbb = rbb.reshape(1, ty, tx, cap, 32)
            c3 = counts1.reshape(1, ty, tx).astype(jnp.int32)
            d_comp, dslot_aa = aa_bwd_pallas(
                rbb, c3, fid1[None], z1[None], comp1[None], g1[None],
                resolution, cap, D=D, row0=row0, halo=halo)
            if shading:
                d_color = jnp.where(cov1[None], d_comp[..., :3], 0.0)
            else:
                d_color = d_comp
            dslot = raster_bwd_pallas(rbb, c3, slot1[None], d_color,
                                      jnp.zeros_like(fid1)[None],
                                      jnp.zeros_like(fid1)[None],
                                      resolution, cap, row0=row0)
            table18 = _chain_planes(dslot, dslot_aa, boost, rbb)
            if fs1 is not None:
                dv1, da1 = _scatter_via_slots(table18, fs1[None],
                                              _inc(n_verts), n_verts)
            else:
                dv1, da1 = _scatter_via_faces(
                    table18, bins1.reshape(1, ty, tx, cap), _inc(n_verts),
                    fj.shape[0], n_verts)
            if shading:
                d_bg1 = jnp.where(cov1, 0.0, d_comp[0])
            else:
                d_bg1 = jnp.zeros_like(comp1)
            return dv1[0], da1, d_bg1

        per_cam = [cam_bwd((v_clip[i], bins_l[i], counts_l[i], slot[i],
                            fid[i], z[i], comp[i], cov[i], g[i],
                            None if fslots is None else fslots[i]))
                   for i in range(v_clip.shape[0])]
        dv, da, dbg = (jnp.stack([p[k] for p in per_cam]) for k in range(3))
        d_attrs = da.sum(axis=0)
        if bg_shape is None:
            d_bg = None
        else:
            d_bg = dbg
            extra = d_bg.ndim - len(bg_shape)
            if extra:
                d_bg = d_bg.sum(axis=tuple(range(extra)))
        outs = (dv, d_attrs, d_bg,
                np.zeros(bins.shape, jax.dtypes.float0),
                np.zeros(counts.shape, jax.dtypes.float0))
        if slots_k is not None:
            outs = outs + (np.zeros(fslots.shape, jax.dtypes.float0),)
        return outs

    pipe.defvjp(pipe_fwd, pipe_bwd)
    return pipe
