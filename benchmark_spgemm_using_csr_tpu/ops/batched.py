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

from ..sparse.csr import CSR, INDEX_DTYPE, csr_gather_rows, pad_bucket
from .chunked import ChunkedPlan, pad_gentle, spgemm_chunked
from .symbolic import nnz_upper_bound


def plan_row_batches(
    nnz_ct: np.ndarray, stream_budget: int
) -> list[tuple[int, int]]:
    """Greedy contiguous row blocks with <= stream_budget products each
    (single oversized rows become singleton blocks)."""
    blocks = []
    start = 0
    acc = 0
    for i, c in enumerate(nnz_ct):
        if acc and acc + int(c) > stream_budget:
            blocks.append((start, i))
            start, acc = i, 0
        acc += int(c)
    if start < len(nnz_ct) or not blocks:
        blocks.append((start, len(nnz_ct)))
    return blocks


def spgemm_batched(
    a: CSR,
    b: CSR,
    stream_budget: int = 64 * 1024 * 1024,
    k: int | None = None,
) -> CSR:
    """C = A @ B with bounded peak memory (see module docstring)."""
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

    for lo, hi in blocks:
        rows = np.arange(lo, hi, dtype=np.int32)
        rows_pad = np.full(pad_bucket(rows.size), m, np.int32)
        rows_pad[: rows.size] = rows
        nnz_blk = int(a_rowptr[hi] - a_rowptr[lo])
        a_blk = csr_gather_rows(a, jnp.asarray(rows_pad), pad_bucket(max(nnz_blk, 1)))
        a_blk = CSR(a_blk.rowptr, a_blk.colidx, a_blk.vals, (rows_pad.size, a.n))
        chunks = int(chunk_per_entry[a_rowptr[lo] : a_rowptr[hi]].sum())
        prod = int(nnz_ct[lo:hi].sum())
        # pow2 buckets (not pad_gentle): budget-sized blocks mostly land in
        # ONE bucket, so tens of blocks share a single compilation instead
        # of compiling per block
        plan = ChunkedPlan(
            k=k,
            chunks_cap=pad_bucket(max(chunks, 1)),
            out_cap=pad_bucket(
                max(min(prod, int(np.minimum(nnz_ct[lo:hi], n).sum())), 1)
            ),
            max_run=pad_bucket(int(np.max(a_lens) if a_lens.size else 1)),
        )
        c_blk = spgemm_chunked(a_blk, b, plan)
        rp = np.asarray(c_blk.rowptr)[: rows.size + 1]
        nnz_c_blk = int(rp[-1])
        out_rowptr[lo + 1 : hi + 1] = out_rowptr[lo] + rp[1:]
        cols_parts.append(np.asarray(c_blk.colidx)[:nnz_c_blk])
        vals_parts.append(np.asarray(c_blk.vals)[:nnz_c_blk])

    nnz_c = int(out_rowptr[m])
    cap = pad_bucket(max(nnz_c, 1))
    colidx = np.zeros(cap, np.int32)
    vals = np.zeros(cap, np.asarray(vals_parts[0]).dtype if vals_parts else np.float32)
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
