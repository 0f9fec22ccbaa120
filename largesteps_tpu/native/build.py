"""Build the native library (lazy, cached).

All C++ sources compile into one shared object ``libls_native.so`` next to
this file.  Build runs automatically on first import of a native wrapper
(g++ is part of the baked toolchain); artifacts are content-cached via an
mtime check.
"""
from __future__ import annotations

import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["cholesky.cpp", "remesh.cpp", "hausdorff.cpp"]
_LIB = os.path.join(_DIR, "libls_native.so")
_lock = threading.Lock()


def lib_path() -> str:
    """Return the path of the built shared library, building if stale."""
    with _lock:
        srcs = [os.path.join(_DIR, s) for s in _SOURCES if os.path.exists(os.path.join(_DIR, s))]
        if not srcs:
            raise FileNotFoundError("no native sources found")
        if os.path.exists(_LIB):
            lib_mtime = os.path.getmtime(_LIB)
            if all(os.path.getmtime(s) < lib_mtime for s in srcs):
                return _LIB
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-march=native", "-funroll-loops",
            *srcs, "-o", _LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB
