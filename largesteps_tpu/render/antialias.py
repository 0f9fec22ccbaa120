"""Analytic silhouette-edge antialiasing (nvdiffrast ``dr.antialias``).

Semantics spec (N1 in SURVEY §2.2; used at scripts/render.py:216,220): for
every pair of adjacent pixels (horizontal and vertical) whose triangle IDs
differ, find the silhouette edge of the occluding triangle that crosses the
segment between the two pixel centers; blend color across the pair in
proportion to how far the crossing lies from the pair midpoint.  The blend
factor is a differentiable function of the two edge endpoints' clip-space
positions — in silhouette mode this is the *only* source of
∂loss/∂position — and ``pos_gradient_boost`` multiplies exactly those
position gradients.

TPU design — sparse boundary-pair compaction: in any real frame only
~O(perimeter) of the H·W·2 adjacent pairs straddle a triangle-ID boundary,
so evaluating the edge tests densely wastes >99% of the work (and all of its
gather traffic — measured 327 ms of a 460 ms step at 13×256²).  Instead:

  1. a dense *cheap* pass computes the boundary mask (one int compare per
     pair — pure VPU);
  2. boundary pair indices are compacted into a fixed-capacity list via
     stable argsort (static shapes; the same pattern as the rasterizer's
     triangle binning);
  3. the expensive candidate-edge math (gathers into vertex/face tables,
     crossing parameter, silhouette test) runs on the K compacted pairs
     only;
  4. corrections scatter-add back into the image (out-of-range index +
     ``mode='drop'`` for padding).

Discrete decisions (which pair, which triangle, which edge) are
stop-gradiented; the crossing parameter t stays differentiable, so plain
autodiff yields nvdiffrast's analytic backward: gather ↔ scatter-add
transpose cleanly.  Pairs beyond capacity are dropped deterministically
(lowest flat index first) — use ``aa_cap`` to size capacity; the dense
reference implementation (``antialias_dense``) remains as the semantic
oracle and for capacity-free use.

Mesh edge adjacency (silhouette test) is a host-precomputed (F, 3) table
rebuilt once per topology epoch.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["antialias", "antialias_dense", "face_adjacency"]


def face_adjacency(faces: np.ndarray) -> np.ndarray:
    """For each face edge e=(f[e], f[(e+1)%3]), the index of the face sharing
    that (undirected) edge, or −1 on boundary.  Host, once per topology."""
    faces = np.asarray(faces)
    F = faces.shape[0]
    edge_map: dict = {}
    for fi in range(F):
        for e in range(3):
            a, b = int(faces[fi, e]), int(faces[fi, (e + 1) % 3])
            key = (a, b) if a < b else (b, a)
            edge_map.setdefault(key, []).append(fi)
    opp = np.full((F, 3), -1, dtype=np.int32)
    for fi in range(F):
        for e in range(3):
            a, b = int(faces[fi, e]), int(faces[fi, (e + 1) % 3])
            key = (a, b) if a < b else (b, a)
            for other in edge_map[key]:
                if other != fi:
                    opp[fi, e] = other
                    break
    return opp


def _boost(x, factor):
    """Identity in the forward pass; multiplies the gradient by ``factor``."""
    if factor == 1.0:
        return x
    return jax.lax.stop_gradient(x) + factor * (x - jax.lax.stop_gradient(x))


def _pair_corrections(color_a, color_b, rast_a, rast_b, pa, pb, v_clip,
                      faces, opp):
    """Corrections (delta_a, delta_b) for one array of adjacent pixel pairs.

    color_*: (..., D); rast_*: (..., 4); pa/pb: (..., 2) NDC pixel centers;
    v_clip: (V, 4); faces/opp: (F, 3).  Shared by the sparse and dense paths.
    """
    sg = jax.lax.stop_gradient
    id_a = sg(rast_a[..., 3]).astype(jnp.int32)
    id_b = sg(rast_b[..., 3]).astype(jnp.int32)
    differs = id_a != id_b

    # Occluder choice: the non-background pixel, or the nearer depth if both
    # are covered (background depth → +inf).
    inf = jnp.float32(3.4e38)
    da = jnp.where(id_a > 0, sg(rast_a[..., 2]), inf)
    db = jnp.where(id_b > 0, sg(rast_b[..., 2]), inf)
    owner_is_a = da <= db
    owner_id = jnp.where(owner_is_a, id_a, id_b)       # 1-based
    other_id = jnp.where(owner_is_a, id_b, id_a)
    tri = jnp.maximum(owner_id - 1, 0)                 # (...,) 0-based

    fverts = faces[tri]                                # (..., 3)
    fopp = opp[tri]                                    # (..., 3)

    w = v_clip[..., 3]
    sx = v_clip[..., 0] / jnp.where(w == 0, 1.0, w)
    sy = v_clip[..., 1] / jnp.where(w == 0, 1.0, w)
    w_ok = w > 1e-9

    best_valid = jnp.zeros(tri.shape, bool)
    best_t = jnp.zeros(tri.shape, v_clip.dtype)
    for e in range(3):
        va = fverts[..., e]
        vb = fverts[..., (e + 1) % 3]
        ax, ay = sx[va], sy[va]
        bx, by = sx[vb], sy[vb]
        ex, ey = bx - ax, by - ay
        # signed edge function at both pixel centers
        ea = ex * (pa[..., 1] - ay) - ey * (pa[..., 0] - ax)
        eb = ex * (pb[..., 1] - ay) - ey * (pb[..., 0] - ax)
        separates = (ea > 0) != (eb > 0)
        denom = ea - eb
        t = ea / jnp.where(denom == 0, 1.0, denom)
        # crossing point must lie on the edge segment
        cx = pa[..., 0] + sg(t) * (pb[..., 0] - pa[..., 0])
        cy = pa[..., 1] + sg(t) * (pb[..., 1] - pa[..., 1])
        along = (cx - sg(ax)) * sg(ex) + (cy - sg(ay)) * sg(ey)
        within = (along >= 0) & (along <= sg(ex * ex + ey * ey))
        # silhouette: the across-edge neighbor is not the other pixel's tri.
        # A background other-pixel (other_id == 0) always qualifies — note
        # its 0-based id (−1) must not collide with the boundary marker −1.
        silhouette = (other_id == 0) | (fopp[..., e] != (other_id - 1))
        valid = sg(separates & within) & silhouette & w_ok[va] & w_ok[vb]
        take = valid & ~best_valid
        best_t = jnp.where(take, t, best_t)
        best_valid = best_valid | valid

    active = differs & (owner_id > 0) & best_valid
    t = best_t
    # blend weights: crossing past the pair midpoint covers the far pixel
    wa = jnp.where(sg(t) < 0.5, 0.5 - t, 0.0)
    wb = jnp.where(sg(t) >= 0.5, t - 0.5, 0.0)
    diff = color_b - color_a
    delta_a = jnp.where(active[..., None], wa[..., None] * diff, 0.0)
    delta_b = jnp.where(active[..., None], -wb[..., None] * diff, 0.0)
    return delta_a, delta_b


def _auto_cap(n_pairs: int) -> int:
    """Default boundary-pair capacity: silhouettes are O(perimeter), so an
    eighth of all pairs is a generous static bound; floor keeps tiny test
    images exact."""
    cap = max(2048, n_pairs // 8)
    return min(n_pairs, ((cap + 511) // 512) * 512)


def antialias(color, rast, v_clip, faces, opp, pos_gradient_boost: float = 1.0,
              cap: int | None = None):
    """Antialias ``color`` (C, H, W, D) given rasterizer output and clip
    positions (C, V, 4).  Returns (C, H, W, D).

    Sparse path: identical output to :func:`antialias_dense` whenever the
    per-camera boundary-pair count fits in ``cap`` (default: auto-sized)."""
    faces = jnp.asarray(faces)
    opp = jnp.asarray(opp)
    C, H, W, D = color.shape
    n_h = H * (W - 1)
    n_v = (H - 1) * W
    n_pairs = n_h + n_v
    if cap is None:
        cap = _auto_cap(n_pairs)
    cap = min(cap, n_pairs)

    xs = (jnp.arange(W, dtype=color.dtype) + 0.5) / W * 2.0 - 1.0
    ys = (jnp.arange(H, dtype=color.dtype) + 0.5) / H * 2.0 - 1.0

    # flat pair table: pair p ↦ (flat_a, flat_b) pixel indices.  Horizontal
    # pairs first (row r, col c)↔(r, c+1), then vertical (r, c)↔(r+1, c).
    # Built once per (H, W) as numpy constants — indices are static data.
    rr_h, cc_h = np.meshgrid(np.arange(H), np.arange(W - 1), indexing="ij")
    a_h = (rr_h * W + cc_h).reshape(-1)
    b_h = a_h + 1
    rr_v, cc_v = np.meshgrid(np.arange(H - 1), np.arange(W), indexing="ij")
    a_v = (rr_v * W + cc_v).reshape(-1)
    b_v = a_v + W
    flat_a = jnp.asarray(np.concatenate([a_h, a_v]), jnp.int32)
    flat_b = jnp.asarray(np.concatenate([b_h, b_v]), jnp.int32)

    vb = _boost(v_clip, pos_gradient_boost)
    sg = jax.lax.stop_gradient

    def per_cam(col, rst, vcb):
        col_f = col.reshape(H * W, D)
        rst_f = rst.reshape(H * W, 4)
        tid = sg(rst_f[:, 3]).astype(jnp.int32)

        # 1. cheap dense boundary mask over all pairs
        differs = tid[flat_a] != tid[flat_b]           # (n_pairs,)

        # 2. compact to K pair indices (stable: lowest pair index first)
        order = jnp.argsort(~differs, stable=True)
        sel = order[:cap]                              # (K,) pair ids
        valid = differs[sel]

        pa_idx = flat_a[sel]
        pb_idx = flat_b[sel]

        # 3. expensive math on the K pairs only
        ax = xs[pa_idx % W]
        ay = ys[pa_idx // W]
        bx = xs[pb_idx % W]
        by = ys[pb_idx // W]
        pa = jnp.stack([ax, ay], axis=-1)
        pb = jnp.stack([bx, by], axis=-1)
        delta_a, delta_b = _pair_corrections(
            col_f[pa_idx], col_f[pb_idx], rst_f[pa_idx], rst_f[pb_idx],
            pa, pb, vcb, faces, opp,
        )
        delta_a = jnp.where(valid[:, None], delta_a, 0.0)
        delta_b = jnp.where(valid[:, None], delta_b, 0.0)

        # 4. scatter-add; padded/invalid slots dropped via out-of-range index
        tgt_a = jnp.where(valid, pa_idx, H * W)
        tgt_b = jnp.where(valid, pb_idx, H * W)
        out = col_f.at[tgt_a].add(delta_a, mode="drop")
        out = out.at[tgt_b].add(delta_b, mode="drop")
        return out.reshape(H, W, D)

    return jax.vmap(per_cam)(color, rast, vb)


def antialias_dense(color, rast, v_clip, faces, opp,
                    pos_gradient_boost: float = 1.0):
    """Dense reference implementation (every adjacent pair evaluated):
    capacity-free semantic oracle for the sparse path."""
    faces = jnp.asarray(faces)
    opp = jnp.asarray(opp)
    C, H, W, _ = color.shape
    xs = (jnp.arange(W, dtype=color.dtype) + 0.5) / W * 2.0 - 1.0
    ys = (jnp.arange(H, dtype=color.dtype) + 0.5) / H * 2.0 - 1.0
    px = jnp.broadcast_to(xs[None, :], (H, W))
    py = jnp.broadcast_to(ys[:, None], (H, W))
    centers = jnp.stack([px, py], axis=-1)             # (H, W, 2)

    vb = _boost(v_clip, pos_gradient_boost)

    def per_cam(col, rst, vcb):
        out = col
        # horizontal pairs: (i, j) ↔ (i, j+1)
        da, db = _pair_corrections(
            col[:, :-1], col[:, 1:], rst[:, :-1], rst[:, 1:],
            centers[:, :-1], centers[:, 1:], vcb, faces, opp,
        )
        out = out.at[:, :-1].add(da).at[:, 1:].add(db)
        # vertical pairs: (i, j) ↔ (i+1, j)
        da, db = _pair_corrections(
            col[:-1], col[1:], rst[:-1], rst[1:],
            centers[:-1], centers[1:], vcb, faces, opp,
        )
        out = out.at[:-1].add(da).at[1:].add(db)
        return out

    return jax.vmap(per_cam)(color, rast, vb)
