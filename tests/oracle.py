"""Slow numpy oracle implementing the documented nvdiffrast semantics,
used as golden for both the XLA reference path and the Pallas kernels
(SURVEY §4: "golden-image + golden-gradient tests ... vs tiny CPU oracle").
"""
import numpy as np


def oracle_rasterize(v_clip, faces, height, width):
    """v_clip (V, 4), faces (F, 3) → rast (H, W, 4) = (u, v, z/w, id+1).

    Pixel (i, j) center at NDC (2(j+½)/W−1, 2(i+½)/H−1), row 0 = bottom.
    """
    rast = np.zeros((height, width, 4), dtype=np.float64)
    zbuf = np.full((height, width), np.inf)
    def cross2(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    w = v_clip[:, 3]
    for t, f in enumerate(faces):
        if np.any(w[f] <= 1e-9):
            continue
        s = v_clip[f, :2] / w[f, None]
        zw = v_clip[f, 2] / w[f]
        area = cross2(s[1] - s[0], s[2] - s[0])
        if abs(area) < 1e-12:
            continue
        for i in range(height):
            py = (i + 0.5) / height * 2 - 1
            for j in range(width):
                px = (j + 0.5) / width * 2 - 1
                p = np.array([px, py])
                b0 = cross2(s[2] - s[1], p - s[1]) / area
                b1 = cross2(s[0] - s[2], p - s[2]) / area
                b2 = 1 - b0 - b1
                if b0 < 0 or b1 < 0 or b2 < 0:
                    continue
                depth = b0 * zw[0] + b1 * zw[1] + b2 * zw[2]
                if depth < zbuf[i, j]:
                    zbuf[i, j] = depth
                    q = np.array([b0, b1, b2]) / w[f]
                    q /= q.sum()
                    rast[i, j] = [q[0], q[1], depth, t + 1]
    return rast


def oracle_interpolate(attr, rast, faces):
    """attr (V, D), rast (H, W, 4) → (H, W, D)."""
    H, W, _ = rast.shape
    out = np.zeros((H, W, attr.shape[1]))
    for i in range(H):
        for j in range(W):
            tid = int(rast[i, j, 3])
            if tid == 0:
                continue
            f = faces[tid - 1]
            u, v = rast[i, j, 0], rast[i, j, 1]
            out[i, j] = u * attr[f[0]] + v * attr[f[1]] + (1 - u - v) * attr[f[2]]
    return out
