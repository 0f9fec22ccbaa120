"""ctypes wrapper for the native Botsch-Kobbelt remesher (remesh.cpp).

Mirrors the reference surface ``pyremesh.remesh_botsch(v, f, iters, h,
project)`` (scripts/main.py:149).
"""
from __future__ import annotations

import ctypes

import numpy as np

from .build import lib_path

__all__ = ["remesh_botsch"]

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(lib_path())
        lib.ls_remesh.restype = ctypes.c_int
        lib.ls_remesh.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C"), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ls_free_buf.restype = None
        lib.ls_free_buf.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def remesh_botsch(v: np.ndarray, f: np.ndarray, iterations: int = 5,
                  h: float = 0.1, project: bool = True):
    """Isotropic remesh to target edge length ``h``; returns (v', f')."""
    lib = _load()
    v = np.ascontiguousarray(v, np.float64)
    f = np.ascontiguousarray(f, np.int32)
    out_v = ctypes.POINTER(ctypes.c_double)()
    out_f = ctypes.POINTER(ctypes.c_int)()
    out_nv = ctypes.c_int()
    out_nf = ctypes.c_int()
    rc = lib.ls_remesh(v, len(v), f, len(f), int(iterations), float(h),
                       int(bool(project)), ctypes.byref(out_v),
                       ctypes.byref(out_nv), ctypes.byref(out_f),
                       ctypes.byref(out_nf))
    if rc != 0:
        raise RuntimeError("remesh failed")
    nv, nf = out_nv.value, out_nf.value
    v_new = np.ctypeslib.as_array(out_v, shape=(nv, 3)).copy()
    f_new = np.ctypeslib.as_array(out_f, shape=(nf, 3)).copy()
    lib.ls_free_buf(out_v)
    lib.ls_free_buf(out_f)
    return v_new, f_new.astype(np.int32)
