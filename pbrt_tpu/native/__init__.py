"""Native (C++) runtime components, loaded via ctypes.

Compiled on demand into the package directory; every consumer has a pure
numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libpbrt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    src = os.path.join(_HERE, "bvh_builder.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> "ctypes.CDLL | None":
    """Load (compiling if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.bvh_build_sah.restype = ctypes.c_int
            if hasattr(lib, "bvh_build_sbvh"):
                lib.bvh_build_sbvh.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _lib = None
        return _lib
