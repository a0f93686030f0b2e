"""Row-batched (out-of-core) SpGEMM for product streams too large for one
dispatch — the scale path for BASELINE.json config #5 (>=100M-nnz scale-free
matrices, whose intermediate-product count can exceed HBM).

C's rows are computed in contiguous row blocks: each block is an independent
chunked-ESC SpGEMM over a row-slice of A (B untouched), so peak memory is
bounded by the largest block's product stream. Blocks are sized so the
stream stays under ``stream_budget`` products, with whole-row granularity
(a single row whose products exceed the budget still gets its own block —
it must fit HBM regardless). The reference analogue is the merge method's
progressive processing of oversized rows (SURVEY.md §4 stage 3).

Host orchestration is per *block* (not per row), and per-block shapes are
bucket-padded so same-profile blocks share compilations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.csr import CSR, csr_gather_rows, pad_bucket
from .chunked import ChunkedPlan, spgemm_chunked
from .symbolic import nnz_upper_bound


def plan_row_batches(
    nnz_ct: np.ndarray, stream_budget: int
) -> list[tuple[int, int]]:
    """Greedy contiguous row blocks with <= stream_budget products each
    (single oversized rows become singleton blocks). Vectorized: one
    searchsorted per block over the prefix sums — O(blocks log m), not a
    Python loop over millions of rows."""
    m = len(nnz_ct)
    if m == 0:
        return [(0, 0)]
    cum = np.concatenate([[0], np.cumsum(nnz_ct, dtype=np.int64)])
    blocks = []
    start = 0
    while start < m:
        end = int(np.searchsorted(cum, cum[start] + stream_budget, side="right")) - 1
        end = max(end, start + 1)  # oversized single row -> singleton block
        end = min(end, m)
        blocks.append((start, end))
        start = end
    return blocks


def spgemm_batched(
    a: CSR,
    b: CSR,
    stream_budget: int = 64 * 1024 * 1024,
    k: int | None = None,
    as_scipy: bool | None = None,
) -> "CSR | object":
    """C = A @ B with bounded peak memory (see module docstring).

    as_scipy: return a host scipy CSR instead of a device CSR container.
    None = auto: host result whenever the assembled C exceeds 2 GiB (the
    point of the out-of-core path is that C may not fit HBM)."""
    m, n = a.m, b.n
    nnz_ct = np.asarray(jax.jit(nnz_upper_bound)(a, b))
    a_rowptr = np.asarray(a.rowptr)
    a_lens = np.diff(a_rowptr)
    b_len = np.diff(np.asarray(b.rowptr))
    total = int(nnz_ct.sum())

    if total <= stream_budget:
        from .chunked import make_chunked_plan

        return spgemm_chunked(a, b, make_chunked_plan(a, b, k=k))

    if k is None:
        nnz_a = int(a_rowptr[-1])
        k = int(np.clip(round(total / max(nnz_a, 1)), 4, 256))
    k = min(k, b.capacity)

    blocks = plan_row_batches(nnz_ct, stream_budget)

    out_rowptr = np.zeros(m + 1, np.int64)
    cols_parts = []
    vals_parts = []
    lens_b = b_len[np.asarray(a.colidx)[: int(a_rowptr[-1])]]
    chunk_per_entry = np.ceil(lens_b / k).astype(np.int64) if lens_b.size else lens_b
    chunk_cum = np.concatenate([[0], np.cumsum(chunk_per_entry)])
    prod_cum = np.concatenate([[0], np.cumsum(nnz_ct, dtype=np.int64)])
    out_bound = np.concatenate(
        [[0], np.cumsum(np.minimum(nnz_ct, n), dtype=np.int64)]
    )

    # UNIFORM capacities (max over blocks) so every block shares ONE
    # compilation — per-block shape buckets caused a ~40-70 s compile per
    # block through the remote compiler (measured: minutes -> one compile)
    rows_cap = pad_bucket(max(hi - lo for lo, hi in blocks))
    nnz_cap = pad_bucket(
        max(int(a_rowptr[hi] - a_rowptr[lo]) for lo, hi in blocks)
    )
    chunks_cap = pad_bucket(
        max(int(chunk_cum[a_rowptr[hi]] - chunk_cum[a_rowptr[lo]]) for lo, hi in blocks)
    )
    out_cap = pad_bucket(
        max(int(min(prod_cum[hi] - prod_cum[lo], out_bound[hi] - out_bound[lo]))
            for lo, hi in blocks)
    )
    plan = ChunkedPlan(
        k=k,
        chunks_cap=chunks_cap,
        out_cap=out_cap,
        max_run=pad_bucket(int(np.max(a_lens) if a_lens.size else 1)),
    )

    import logging

    log = logging.getLogger(__name__)
    for i, (lo, hi) in enumerate(blocks):
        rows = np.arange(lo, hi, dtype=np.int32)
        rows_pad = np.full(rows_cap, m, np.int32)
        rows_pad[: rows.size] = rows
        a_blk = csr_gather_rows(a, jnp.asarray(rows_pad), nnz_cap)
        a_blk = CSR(a_blk.rowptr, a_blk.colidx, a_blk.vals, (rows_cap, a.n))
        c_blk = spgemm_chunked(a_blk, b, plan)
        if i % 8 == 0:
            log.info("block %d/%d rows [%d, %d)", i + 1, len(blocks), lo, hi)
        rp = np.asarray(c_blk.rowptr)[: rows.size + 1]
        nnz_c_blk = int(rp[-1])
        out_rowptr[lo + 1 : hi + 1] = out_rowptr[lo] + rp[1:]
        cols_parts.append(np.asarray(c_blk.colidx)[:nnz_c_blk])
        vals_parts.append(np.asarray(c_blk.vals)[:nnz_c_blk])

    nnz_c = int(out_rowptr[m])
    val_dtype = np.asarray(vals_parts[0]).dtype if vals_parts else np.float32
    if as_scipy is None:
        as_scipy = nnz_c * (4 + np.dtype(val_dtype).itemsize) > (2 << 30)
    if as_scipy:
        import scipy.sparse as sp

        colidx = np.concatenate(cols_parts) if cols_parts else np.zeros(0, np.int32)
        vals = np.concatenate(vals_parts) if vals_parts else np.zeros(0, val_dtype)
        return sp.csr_matrix(
            (vals, colidx, out_rowptr.astype(np.int64)), shape=(m, n)
        )
    cap = pad_bucket(max(nnz_c, 1))
    colidx = np.zeros(cap, np.int32)
    vals = np.zeros(cap, val_dtype)
    off = 0
    for c_, v_ in zip(cols_parts, vals_parts):
        colidx[off : off + len(c_)] = c_
        vals[off : off + len(v_)] = v_
        off += len(c_)
    return CSR(
        rowptr=jnp.asarray(out_rowptr.astype(np.int32)),
        colidx=jnp.asarray(colidx),
        vals=jnp.asarray(vals),
        shape=(m, n),
    )
