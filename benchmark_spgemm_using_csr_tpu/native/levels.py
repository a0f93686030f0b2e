"""ctypes binding + lazy build for the native SpTRSV level scheduler
(levels.cpp). Falls back to a numpy/Python loop when no compiler is
available (same convention as mtxparse.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "levels.cpp")
_LIB = os.path.join(_DIR, "liblevels.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.csr_levels.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.csr_levels.restype = ctypes.c_int
        _lib = lib
        return _lib


def csr_levels(rowptr: np.ndarray, colidx: np.ndarray, m: int,
               upper: bool) -> np.ndarray:
    """Dependency level per row for the triangular-solve DAG (0-based)."""
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    colidx = np.ascontiguousarray(colidx, np.int32)
    levels = np.zeros(m, np.int32)
    lib = _load()
    if lib is not None:
        rc = lib.csr_levels(m, rowptr, colidx, int(upper), levels)
        if rc == 0:
            return levels
    # Python fallback: same sequential recurrence.
    order = range(m - 1, -1, -1) if upper else range(m)
    for i in order:
        seg = colidx[rowptr[i]:rowptr[i + 1]]
        deps = seg[seg > i] if upper else seg[seg < i]
        deps = deps[deps < m]
        if deps.size:
            levels[i] = int(levels[deps].max()) + 1
    return levels
