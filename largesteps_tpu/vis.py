"""Mesh visualization for figures — TPU-native replacement for the
reference's Blender subprocess pipeline (scripts/blender_render.py +
scripts/preamble.py:27-68, C19 in SURVEY §2).

Instead of shelling out to an external renderer, figures render through the
framework's own differentiable rasterizer (dogfooding): shaded view with SH
lighting, optional wireframe overlay, optional self-intersection highlight,
saved as PNG via matplotlib.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .render.renderer import Renderer, Topology
from .render.camera import persp_proj, build_mvps, project
from .render.raster import rasterize
from .io.synth import make_envmap, turntable_views
from .ops.normals import compute_face_normals, compute_vertex_normals

__all__ = ["render_mesh_image", "save_mesh_png", "self_intersections"]


def render_mesh_image(v, f, res: int = 512, angle_deg: float = 30.0,
                      distance: float = 3.5, wireframe: bool = False,
                      highlight_faces=None):
    """Render one shaded view of a mesh → (res, res, 3) float image."""
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int32)
    scene = {
        "res_x": res, "res_y": res, "fov": 45.0, "near_clip": 0.1,
        "far_clip": 100.0,
        "view_mats": turntable_views(12, distance=distance)[: 1]
        if angle_deg == 0.0 else [
            np.linalg.inv(
                _rot_y(angle_deg) @ _rot_x(-15.0) @ _trans([0, 0, -distance])
            ).astype(np.float32)
        ],
        "envmap": make_envmap(64, 128),
        "envmap_scale": 1.0,
        "mesh-source": {"vertices": v, "faces": f},
        "mesh-target": {"vertices": v, "faces": f},
    }
    renderer = Renderer(scene, shading=True)
    vj = jnp.asarray(v)
    fn = compute_face_normals(vj, f)
    n = compute_vertex_normals(vj, f, fn)
    img = np.asarray(renderer.render(vj, n, Topology(f)))[0, ..., :3]

    if wireframe or highlight_faces is not None:
        vc = project(vj, renderer.mvps)
        rast = np.asarray(rasterize(vc, jnp.asarray(f), (res, res), 256))[0]
        ids = rast[..., 3].astype(np.int32)
        if wireframe:
            # mark pixels whose min barycentric is tiny → near an edge
            u, vv = rast[..., 0], rast[..., 1]
            w2 = 1 - u - vv
            edge = (ids > 0) & (np.minimum(np.minimum(u, vv), w2) < 0.03)
            img = np.where(edge[..., None], img * 0.25, img)
        if highlight_faces is not None:
            mask = np.isin(ids - 1, np.asarray(highlight_faces)) & (ids > 0)
            img = np.where(mask[..., None], np.array([1.0, 0.1, 0.1]), img)
    return np.clip(img[::-1], 0.0, None)  # flip: row 0 is bottom in raster


def _rot_y(a):
    from .render.camera import rotation_matrix
    return rotation_matrix("y", a)


def _rot_x(a):
    from .render.camera import rotation_matrix
    return rotation_matrix("x", a)


def _trans(t):
    from .render.camera import translation_matrix
    return translation_matrix(t)


def save_mesh_png(path, v, f, **kw):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = render_mesh_image(v, f, **kw)
    img = img / max(np.percentile(img, 99.5), 1e-6)
    plt.figure(figsize=(6, 6))
    plt.imshow(np.clip(img, 0, 1))
    plt.axis("off")
    plt.tight_layout(pad=0)
    plt.savefig(path, dpi=120)
    plt.close()
    return path


def self_intersections(v, f, max_pairs: int = 200000):
    """Face indices involved in self-intersections (the reference's
    Blender-based intersection visualization, blender_render.py:87-106).

    Brute bbox prefilter + exact triangle-triangle overlap tests on host;
    intended for figure-scale meshes.
    """
    v = np.asarray(v, np.float64)
    f = np.asarray(f, np.int64)
    tri = v[f]
    lo = tri.min(axis=1)
    hi = tri.max(axis=1)
    order = np.argsort(lo[:, 0], kind="stable")
    hits = set()
    n = len(f)
    checked = 0
    for oi in range(n):
        i = order[oi]
        for oj in range(oi + 1, n):
            j = order[oj]
            if lo[j, 0] > hi[i, 0]:
                break
            if (lo[j] > hi[i]).any() or (lo[i] > hi[j]).any():
                continue
            if len(np.intersect1d(f[i], f[j])) > 0:
                continue  # sharing a vertex: not a self-intersection
            checked += 1
            if checked > max_pairs:
                return sorted(hits)
            if _tri_tri_intersect(tri[i], tri[j]):
                hits.add(int(i))
                hits.add(int(j))
    return sorted(hits)


def _tri_tri_intersect(t1, t2):
    """Möller's interval test (separating-plane based, conservative)."""
    def plane(t):
        n = np.cross(t[1] - t[0], t[2] - t[0])
        return n, -n.dot(t[0])

    n1, d1 = plane(t1)
    s2 = t2 @ n1 + d1
    if (s2 > 1e-12).all() or (s2 < -1e-12).all():
        return False
    n2, d2 = plane(t2)
    s1 = t1 @ n2 + d2
    if (s1 > 1e-12).all() or (s1 < -1e-12).all():
        return False
    # project onto intersection line and compare intervals
    d = np.cross(n1, n2)
    axis = np.argmax(np.abs(d))

    def interval(t, s):
        p = t[:, axis]
        pts = []
        for a in range(3):
            b = (a + 1) % 3
            if s[a] * s[b] < 0:
                alpha = s[a] / (s[a] - s[b])
                pts.append(p[a] + alpha * (p[b] - p[a]))
            elif abs(s[a]) <= 1e-12:
                pts.append(p[a])
        if not pts:
            return None
        return min(pts), max(pts)

    i1 = interval(t1, s1)
    i2 = interval(t2, s2)
    if i1 is None or i2 is None:
        return False
    return not (i1[1] < i2[0] or i2[1] < i1[0])
