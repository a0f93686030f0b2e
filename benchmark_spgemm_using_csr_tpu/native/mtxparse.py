"""ctypes binding + lazy build for the native Matrix Market parser
(mtxparse.cpp). Falls back gracefully (returns None) when no compiler is
available; utils/mtx.py then uses the numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mtxparse.cpp")
_LIB = os.path.join(_DIR, "libmtxparse.so")
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
        lib.mtx_read_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.mtx_read_header.restype = ctypes.c_int
        lib.mtx_read_body.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.mtx_read_body.restype = ctypes.c_int
        _lib = lib
        return _lib


def read_mtx(path: str, expand_symmetry: bool = True):
    """Returns (rows, cols, vals, (m, n)) with symmetry expanded, or None if
    the native parser is unavailable / declines the file (e.g. array
    format)."""
    lib = _load()
    if lib is None:
        return None
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    nnz = ctypes.c_int64()
    field = ctypes.c_int()
    symmetry = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.mtx_read_header(
        path.encode(), ctypes.byref(m), ctypes.byref(n), ctypes.byref(nnz),
        ctypes.byref(field), ctypes.byref(symmetry), err, 256,
    )
    if rc != 0:
        return None  # let the numpy path produce the real error message
    rows = np.empty(nnz.value, np.int32)
    cols = np.empty(nnz.value, np.int32)
    vals = np.empty(nnz.value, np.float64)
    rc = lib.mtx_read_body(path.encode(), nnz.value, rows, cols, vals, err, 256)
    if rc != 0:
        raise ValueError(f"mtx parse error: {err.value.decode()}")
    if symmetry.value in (1, 2) and expand_symmetry:
        off = rows != cols
        sign = -1.0 if symmetry.value == 2 else 1.0
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, sign * vals[off]]),
        )
    return rows, cols, vals, (m.value, n.value)
