"""Geometric quality metrics.

Reference semantics: the symmetric Hausdorff distance
``igl.hausdorff(va, fa, vb, fb) + igl.hausdorff(vb, fb, va, fa)`` used as
the quality metric in figures/comparison/generate_data.py:78-88 (halved in
the influence figure).  Native BVH implementation (native/hausdorff.cpp)
with a numpy fallback for environments without a compiler.
"""
from __future__ import annotations

import ctypes

import numpy as np

__all__ = ["hausdorff", "symmetric_hausdorff"]

_lib = None


def _load():
    global _lib
    if _lib is None:
        from .native.build import lib_path
        lib = ctypes.CDLL(lib_path())
        lib.ls_hausdorff.restype = ctypes.c_double
        lib.ls_hausdorff.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"), ctypes.c_int,
        ]
        _lib = lib
    return _lib


def _hausdorff_numpy(va, vb, fb, chunk=256):
    """Fallback: exact point-to-triangle distances, chunked numpy."""
    tri = vb[fb]                                   # (F, 3, 3)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    worst = 0.0
    for s in range(0, len(va), chunk):
        p = va[s:s + chunk][:, None, :]            # (P, 1, 3)
        ab, ac = b - a, c - a
        ap = p - a[None]
        d1 = (ab[None] * ap).sum(-1)
        d2 = (ac[None] * ap).sum(-1)
        bp = p - b[None]
        d3 = (ab[None] * bp).sum(-1)
        d4 = (ac[None] * bp).sum(-1)
        cp = p - c[None]
        d5 = (ab[None] * cp).sum(-1)
        d6 = (ac[None] * cp).sum(-1)
        va_ = d3 * d6 - d5 * d4
        vb_ = d5 * d2 - d1 * d6
        vc_ = d1 * d4 - d3 * d2
        denom = va_ + vb_ + vc_
        denom = np.where(np.abs(denom) < 1e-300, 1.0, denom)
        v = np.clip(vb_ / denom, 0, 1)
        w = np.clip(vc_ / denom, 0, 1)
        # interior candidate
        q_int = a[None] + ab[None] * v[..., None] + ac[None] * w[..., None]
        # edge/vertex candidates
        def seg(p0, p1):
            d = p1 - p0
            t = ((p - p0[None]) * d[None]).sum(-1) / np.maximum((d * d).sum(-1)[None], 1e-300)
            t = np.clip(t, 0, 1)
            return p0[None] + d[None] * t[..., None]
        candidates = [q_int, seg(a, b), seg(b, c), seg(c, a)]
        d2min = None
        for q in candidates:
            dd = ((p - q) ** 2).sum(-1)
            d2min = dd if d2min is None else np.minimum(d2min, dd)
        worst = max(worst, float(np.sqrt(d2min.min(axis=1).max())))
    return worst


def hausdorff(va, fa, vb, fb) -> float:
    """One-directional h(A→B): max over A's vertices of distance to surface
    B (fa is accepted for API parity with igl and unused, like igl's
    vertex-sampled approximation)."""
    del fa
    va = np.ascontiguousarray(va, np.float64)
    vb = np.ascontiguousarray(vb, np.float64)
    fb = np.ascontiguousarray(fb, np.int32)
    try:
        lib = _load()
        return float(lib.ls_hausdorff(va, len(va), vb, len(vb), fb, len(fb)))
    except Exception:
        return _hausdorff_numpy(va, vb, fb)


def symmetric_hausdorff(va, fa, vb, fb) -> float:
    """h(A→B) + h(B→A), the comparison-figure metric
    (figures/comparison/generate_data.py:86-88).

    Non-finite vertices (a diverged optimization) return inf immediately —
    NaN coordinates make the native BVH traversal's comparisons all-false
    and it effectively never terminates."""
    import numpy as np
    if not (np.isfinite(np.asarray(va)).all()
            and np.isfinite(np.asarray(vb)).all()):
        return float("inf")
    return hausdorff(va, fa, vb, fb) + hausdorff(vb, fb, va, fa)
