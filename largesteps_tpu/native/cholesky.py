"""ctypes wrapper over the native sparse Cholesky (cholesky.cpp).

Replaces the reference's cholespy dependency (largesteps/solvers.py:26-39):
``factorize`` once per topology epoch, ``solve`` per iteration.
"""
from __future__ import annotations

import ctypes

import numpy as np

from .build import lib_path

__all__ = ["factorize", "NativeCholesky"]

_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(lib_path())
        lib.ls_chol_factorize.restype = ctypes.c_void_p
        lib.ls_chol_factorize.argtypes = [
            ctypes.c_int, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
        ]
        lib.ls_chol_solve.restype = ctypes.c_int
        lib.ls_chol_solve.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int,
        ]
        lib.ls_chol_nnz_factor.restype = ctypes.c_int64
        lib.ls_chol_nnz_factor.argtypes = [ctypes.c_void_p]
        lib.ls_chol_free.restype = None
        lib.ls_chol_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeCholesky:
    def __init__(self, n, rows, cols, vals):
        lib = _load()
        rows = np.ascontiguousarray(rows, np.int32)
        cols = np.ascontiguousarray(cols, np.int32)
        vals = np.ascontiguousarray(vals, np.float64)
        self._lib = lib
        self._handle = lib.ls_chol_factorize(int(n), len(vals), rows, cols, vals)
        if not self._handle:
            raise RuntimeError("native Cholesky factorization failed (matrix not SPD?)")
        self.n = int(n)
        self.nnz_factor = lib.ls_chol_nnz_factor(self._handle)

    def solve(self, b: np.ndarray) -> np.ndarray:
        b = np.ascontiguousarray(b, np.float64)
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        x = np.empty_like(b)
        rc = self._lib.ls_chol_solve(self._handle, b, x, b.shape[1])
        if rc != 0:
            raise RuntimeError("native Cholesky solve failed")
        return x[:, 0] if squeeze else x

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ls_chol_free(self._handle)
                self._handle = None
        except Exception:
            pass


def factorize(n, rows, cols, vals) -> NativeCholesky:
    return NativeCholesky(n, rows, cols, vals)
