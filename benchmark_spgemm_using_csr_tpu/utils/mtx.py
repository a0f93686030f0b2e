"""Matrix Market (.mtx) I/O — the equivalent of the reference's vendored NIST
``mmio.c`` reader plus the driver's symmetry expansion / COO→CSR conversion
(SURVEY.md §3 components 1-2; mmio.h/mmio.c [R]).

New design, not a translation: the hot parse loop is vectorized numpy over
a single bulk read (and a native C++ fast path in ``native/`` when built),
instead of per-line fscanf. Behavior contract matched to the reference
driver (SURVEY.md §4 driver contract):
- banner: ``%%MatrixMarket matrix coordinate|array real|integer|pattern
  general|symmetric|skew-symmetric``
- symmetric/skew storage expanded to full
- pattern matrices get synthesized values (1.0, like the reference driver's
  value synthesis [R])
- 1-based indices converted to 0-based
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


class MTXFormatError(ValueError):
    pass


def _parse_banner(line: str):
    parts = line.strip().split()
    if len(parts) != 5 or parts[0] != "%%MatrixMarket" or parts[1].lower() != "matrix":
        raise MTXFormatError(f"bad MatrixMarket banner: {line!r}")
    fmt, field, symmetry = (p.lower() for p in parts[2:5])
    if fmt not in ("coordinate", "array"):
        raise MTXFormatError(f"unsupported format {fmt!r}")
    if field not in ("real", "integer", "pattern", "double"):
        raise MTXFormatError(f"unsupported field {field!r}")
    if symmetry not in ("general", "symmetric", "skew-symmetric"):
        raise MTXFormatError(f"unsupported symmetry {symmetry!r}")
    return fmt, field, symmetry


def read_mtx(path: str, dtype=np.float32, expand_symmetry: bool = True):
    """Read a .mtx file into a canonical scipy CSR (sorted, dedup'd).

    Tries the native C++ parser first (see native/), falls back to the
    vectorized numpy path.
    """
    try:
        from ..native import mtxparse as _native

        out = _native.read_mtx(path, expand_symmetry=expand_symmetry)
        if out is not None:
            rows, cols, vals, shape = out
            mat = sp.coo_matrix(
                (vals.astype(dtype), (rows, cols)), shape=shape
            ).tocsr()
            mat.sum_duplicates()
            mat.sort_indices()
            return mat
    except Exception:
        pass
    return _read_mtx_numpy(path, dtype, expand_symmetry)


def _read_mtx_numpy(path: str, dtype=np.float32, expand_symmetry: bool = True):
    with open(path, "rb") as f:
        data = f.read()
    text = data.decode("utf-8", errors="replace")
    lines = text.splitlines()
    if not lines:
        raise MTXFormatError("empty file")
    fmt, field, symmetry = _parse_banner(lines[0])

    # skip comments
    i = 1
    while i < len(lines) and (not lines[i].strip() or lines[i].lstrip().startswith("%")):
        i += 1
    if i >= len(lines):
        raise MTXFormatError("missing size line")
    size_parts = lines[i].split()
    body = "\n".join(lines[i + 1 :])

    if fmt == "array":
        m, n = int(size_parts[0]), int(size_parts[1])
        vals = np.fromstring(body, sep="\n", dtype=np.float64)  # noqa: NPY201
        if vals.size != m * n:
            vals = np.array(body.split(), dtype=np.float64)
        dense = vals.reshape((n, m)).T  # column-major per MM spec
        if symmetry in ("symmetric", "skew-symmetric") and expand_symmetry:
            lower = np.tril(dense, -1)
            dense = dense + (lower.T if symmetry == "symmetric" else -lower.T)
        return sp.csr_matrix(dense.astype(dtype))

    m, n, nnz = int(size_parts[0]), int(size_parts[1]), int(size_parts[2])
    if field == "pattern":
        arr = np.array(body.split(), dtype=np.int64)
        if arr.size != 2 * nnz:
            raise MTXFormatError(f"expected {2*nnz} tokens, got {arr.size}")
        rows = arr[0::2] - 1
        cols = arr[1::2] - 1
        vals = np.ones(nnz, np.float64)  # synthesized, like the reference driver
    else:
        arr = np.array(body.split(), dtype=np.float64)
        if arr.size != 3 * nnz:
            raise MTXFormatError(f"expected {3*nnz} tokens, got {arr.size}")
        rows = arr[0::3].astype(np.int64) - 1
        cols = arr[1::3].astype(np.int64) - 1
        vals = arr[2::3]

    if symmetry in ("symmetric", "skew-symmetric") and expand_symmetry:
        off = rows != cols
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, sign * vals[off]]),
        )

    mat = sp.coo_matrix((vals.astype(dtype), (rows, cols)), shape=(m, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def write_mtx(path: str, mat, field: str | None = None) -> None:
    """Write a scipy sparse matrix as coordinate general .mtx."""
    coo = sp.coo_matrix(mat)
    field = field or ("integer" if np.issubdtype(coo.data.dtype, np.integer) else "real")
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        f.write(f"% written by benchmark_spgemm_using_csr_tpu\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {coo.nnz}\n")
        out = np.empty((coo.nnz, 3), np.float64)
        out[:, 0] = coo.row + 1
        out[:, 1] = coo.col + 1
        out[:, 2] = coo.data
        np.savetxt(f, out, fmt="%d %d %.17g")
