"""Row-batched (out-of-core) SpGEMM for product streams too large for one
dispatch — the scale path for BASELINE.json config #5 (>=100M-nnz scale-free
matrices, whose intermediate-product count can exceed HBM).

C's rows are computed in contiguous row blocks: each block is an independent
SpGEMM over a row-slice of A (B untouched), so peak memory is bounded by the
largest block's working set. The reference analogue is the merge method's
progressive processing of oversized rows (SURVEY.md §4 stage 3).

Rebuilt for round 3 (VERDICT r2 missing #2: the old path built a raw
fixed-k ChunkedPlan and pulled every block's colidx/vals to host
synchronously — dense_rows_8k_ooc ran 0.030 GF vs 27.8 in-core, a ~900x
cliff). The new design:

- **Per-block method dispatch** among the tuned backends (dense-MXU /
  grouped-ESC / chunked-ESC) using the same measured cost models as the
  in-core dispatcher (ops/dispatch), evaluated on a representative block.
- **Host planning once per structure** (cached on buffer ids): C's exact
  structural pattern is the concatenation of per-block pattern products, so
  the output rowptr/colidx live in the plan as device-resident arrays and
  per-block value extraction positions are static.
- **Zero per-block host round-trips on the hot call**: block A values are
  static-bound `dynamic_slice`s of the device-resident full A (structure
  arrays are uploaded once at plan time), every block dispatch is async,
  and assembly is ONE jitted concatenation of static value slices — the
  axon tunnel's ~26 ms round trip is paid per dispatch, never per D2H.
- **as_scipy** (C larger than HBM): values fetched once after all blocks
  are dispatched, structure from the host plan.
"""
from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.csr import CSR, pad_bucket
from .chunked import make_chunked_plan, spgemm_chunked
from .symbolic import nnz_upper_bound

log = logging.getLogger(__name__)


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


@dataclasses.dataclass
class BatchedPlan:
    """Host-built once per (A-structure, B-structure) pair; device arrays
    are resident so repeat calls (bench loops, iterative solvers) pay no
    re-upload."""

    method: str  # 'dense' | 'grouped' | 'chunked'
    blocks: tuple  # ((lo, hi), ...) contiguous row spans
    rows_cap: int  # unified padded rows per block
    nnz_cap: int  # unified padded A entries per block
    slice0: tuple  # per-block static start into A.vals
    nnz_blk: tuple  # per-block exact A nnz
    nnz_c_blk: tuple  # per-block exact nnz(C) (static assembly offsets)
    nnz_c: int
    out_rowptr: jax.Array  # (m + 1,) final C rowptr (device)
    out_colidx: jax.Array  # (cap_c,) final C colidx (device)
    cap_c: int
    host_rowptr: np.ndarray  # host copies for as_scipy
    host_colidx: np.ndarray
    blk_rowptr: tuple  # per-block (rows_cap + 1,) device rowptr
    blk_colidx: tuple  # per-block (nnz_cap,) device colidx
    blk_rows_e: tuple  # per-block (nnz_cap,) entry row ids (pad: rows_cap)
    # dense method extras
    flat_c: tuple = ()  # per-block (cap_c_u,) flat C positions (pad: -1)
    cap_c_u: int = 0  # unified per-block C capacity
    full_dense: tuple = ()  # per-block "C block is fully dense" flags
    # grouped method extras: per-block GroupedSchedule under unified statics
    grouped_scheds: tuple = ()
    # chunked method extras
    chunked_plan: object = None


def _block_slices(a_sp, blocks, rows_cap, nnz_cap):
    """Per-block padded structure (host): rowptr, colidx, entry row ids."""
    rowptrs, colidxs, rows_es, slice0, nnz_blk = [], [], [], [], []
    for lo, hi in blocks:
        s0, s1 = int(a_sp.indptr[lo]), int(a_sp.indptr[hi])
        nb = s1 - s0
        rp = np.full(rows_cap + 1, nb, np.int32)
        rp[: hi - lo + 1] = a_sp.indptr[lo:hi + 1] - s0
        ci = np.zeros(nnz_cap, np.int32)
        ci[:nb] = a_sp.indices[s0:s1]
        re = np.full(nnz_cap, rows_cap, np.int32)
        re[:nb] = (
            np.repeat(np.arange(lo, hi), np.diff(a_sp.indptr[lo:hi + 1]))
            - lo
        )
        rowptrs.append(rp)
        colidxs.append(ci)
        rows_es.append(re)
        slice0.append(s0)
        nnz_blk.append(nb)
    return rowptrs, colidxs, rows_es, slice0, nnz_blk


def make_batched_plan(
    a: CSR,
    b: CSR,
    stream_budget: int = 64 * 1024 * 1024,
    dense_block_bytes: int = 128 << 20,
    method: str | None = None,
) -> BatchedPlan:
    """Host stage-2 for the out-of-core path (plan once, run many)."""
    import scipy.sparse as sp

    from ..sparse.csr import host_view

    m, n = a.m, b.n
    a_sp = sp.csr_matrix(
        (
            np.asarray(host_view(a.vals))[: int(host_view(a.rowptr)[-1])],
            np.asarray(host_view(a.colidx))[: int(host_view(a.rowptr)[-1])],
            np.asarray(host_view(a.rowptr)[: m + 1]),
        ),
        shape=(m, a.n),
    )
    b_rowptr = host_view(b.rowptr)
    b_len = np.diff(b_rowptr).astype(np.int64)
    nnz_ct = np.zeros(m, np.int64)
    if a_sp.nnz:
        lens = b_len[a_sp.indices]
        cs = np.concatenate([[0], np.cumsum(lens)])
        nnz_ct = cs[a_sp.indptr[1:]] - cs[a_sp.indptr[:-1]]

    blocks = plan_row_batches(nnz_ct, stream_budget)

    # ---- method: same measured cost models as the in-core dispatcher,
    # evaluated on the largest block (blocks are product-balanced, so it is
    # representative; the full matrix would overflow the models' regimes)
    if method is None:
        from . import dispatch as D

        lo, hi = max(blocks, key=lambda be: be[1] - be[0])
        sub = CSR.from_scipy(
            sp.csr_matrix(a_sp[lo:hi]), dtype=a.vals.dtype
        )
        est = {
            "chunked": D.estimate_chunked_s(sub, b),
            "grouped": D.estimate_grouped_s(sub, b),
            "dense": D.estimate_dense_s(sub, b),
        }
        method = min(est, key=est.get)
        log.info("batched method=%s est=%s", method, est)

    if method == "dense":
        # memory-bound blocking: block dense C = rows * n * itemsize
        itemsize = np.dtype(a.vals.dtype).itemsize
        rows_blk = int(max(min(dense_block_bytes // (n * itemsize), m), 8))
        blocks = [(lo, min(lo + rows_blk, m)) for lo in range(0, m, rows_blk)]

    rows_cap = pad_bucket(max(hi - lo for lo, hi in blocks))
    nnz_cap = pad_bucket(
        max(int(a_sp.indptr[hi] - a_sp.indptr[lo]) for lo, hi in blocks) or 1
    )
    rowptrs, colidxs, rows_es, slice0, nnz_blk = _block_slices(
        a_sp, blocks, rows_cap, nnz_cap
    )

    # ---- exact per-block C pattern (assembly offsets + output structure)
    pat_a = sp.csr_matrix(
        (np.ones(a_sp.nnz, np.float64), a_sp.indices, a_sp.indptr),
        shape=a_sp.shape,
    )
    sb_ci = np.asarray(host_view(b.colidx))[: int(b_rowptr[-1])]
    pat_b = sp.csr_matrix(
        (np.ones(len(sb_ci), np.float64), sb_ci,
         np.asarray(b_rowptr[: b.m + 1])),
        shape=(b.m, n),
    )
    pats = []
    for lo, hi in blocks:
        pc = (pat_a[lo:hi] @ pat_b).tocsr()
        pc.sort_indices()
        pats.append(pc)
    nnz_c_blk = tuple(int(p.nnz) for p in pats)
    nnz_c = int(sum(nnz_c_blk))
    cap_c = pad_bucket(max(nnz_c, 1))
    out_rowptr = np.zeros(m + 1, np.int64)
    out_colidx = np.zeros(cap_c, np.int32)
    off = 0
    for (lo, hi), pc in zip(blocks, pats):
        out_rowptr[lo + 1:hi + 1] = off + pc.indptr[1:]
        out_colidx[off:off + pc.nnz] = pc.indices
        off += pc.nnz
    assert off == nnz_c

    plan = BatchedPlan(
        method=method,
        blocks=tuple(blocks),
        rows_cap=rows_cap,
        nnz_cap=nnz_cap,
        slice0=tuple(slice0),
        nnz_blk=tuple(nnz_blk),
        nnz_c_blk=nnz_c_blk,
        nnz_c=nnz_c,
        out_rowptr=jnp.asarray(out_rowptr.astype(np.int32)),
        out_colidx=jnp.asarray(out_colidx),
        cap_c=cap_c,
        host_rowptr=out_rowptr,
        host_colidx=out_colidx,
        blk_rowptr=tuple(jnp.asarray(r) for r in rowptrs),
        blk_colidx=tuple(jnp.asarray(c) for c in colidxs),
        blk_rows_e=tuple(jnp.asarray(r) for r in rows_es),
    )

    if method == "dense":
        # per-block extraction mode: 'full' (C block structurally dense —
        # identity), 'shift' (near-dense: host kept/disp + monotone shift
        # compaction — the round-5 scan-tail port was MEASURED SLOWER
        # here: at near-full C the one-pass scan's ~0.63 ns/slot dus
        # machinery loses to ~log2(holes) cheap shift passes,
        # dense_rows_8k_ooc 16.75 -> 14.5 GF, reverted), 'gather'
        # (sparse C: nnz_c flat-position gathers)
        cap_c_u = pad_bucket(max(max(nnz_c_blk), 1))
        extract = []
        for (lo, hi), pc in zip(blocks, pats):
            rows_b = hi - lo
            slots = rows_cap * n
            flat = np.zeros(pc.nnz, np.int64)
            rr = np.repeat(
                np.arange(rows_b, dtype=np.int64), np.diff(pc.indptr)
            )
            flat = rr * n + pc.indices.astype(np.int64)
            holes = slots - pc.nnz
            if holes == 0:
                extract.append(("full", None))
            elif holes < slots // 8:
                kept = np.zeros(slots, np.bool_)
                kept[flat] = True
                disp = (np.cumsum(~kept) - ~kept).astype(np.int32)
                extract.append((
                    "shift",
                    (jnp.asarray(kept), jnp.asarray(disp),
                     max(int(holes).bit_length(), 1)),
                ))
            else:
                f = np.full(cap_c_u, slots, np.int64)  # pad -> guard
                f[: pc.nnz] = flat
                extract.append(("gather", jnp.asarray(f.astype(np.int32))))
        plan.flat_c = tuple(extract)
        plan.cap_c_u = cap_c_u
    elif method == "grouped":
        plan.grouped_scheds = _grouped_block_scheds(
            plan, a, b, rowptrs, colidxs
        )
        if plan.grouped_scheds is None:
            log.info("grouped regime rejected a block; falling back chunked")
            return make_batched_plan(
                a, b, stream_budget=stream_budget,
                dense_block_bytes=dense_block_bytes, method="chunked",
            )
    if method == "chunked":
        from ..parallel.dist import make_dist_local_plan

        plan.chunked_plan = make_dist_local_plan(
            a, b, n_shards=len(blocks),
            bounds=np.asarray([lo for lo, _ in blocks] + [m], np.int64),
        )
    return plan


def _grouped_block_scheds(plan, a, b, rowptrs, colidxs):
    """Per-block grouped schedules under unified statics (the
    parallel/dist.make_dist_grouped_plan two-pass trick, over
    product-balanced blocks instead of uniform row shards)."""
    from .grouped import make_grouped_plan

    subs = []
    for rp, ci, s0, nb in zip(
        rowptrs, colidxs, plan.slice0, plan.nnz_blk
    ):
        # structure-only pass: vals must be NONZERO — make_grouped_plan's
        # exact-nnz pattern product bools the values, and explicit zeros
        # would erase the pattern
        va = np.ones(plan.nnz_cap, np.float32)
        subs.append(
            CSR(jnp.asarray(rp), jnp.asarray(ci),
                jnp.asarray(va).astype(a.vals.dtype),
                (plan.rows_cap, a.n))
        )
    base = make_grouped_plan(subs[0], b)
    if base is None:
        return None
    bp = base.plan
    p1 = [
        make_grouped_plan(
            s, b, al=bp.al, target_slots=bp.cs * bp.lanes,
            force_scatter_set=bp.scatter_set,
        )
        for s in subs
    ]
    if any(p is None for p in p1):
        return None
    live = [p.plan for p in p1]
    from .chunked import pad_gentle

    cs_u = max(p.cs for p in live)
    g_u = max(p.g_cap for p in live)
    prod_u = g_u * cs_u * bp.lanes
    nnz_max = max(p.nnz_c for p in live)
    unified = dataclasses.replace(
        bp,
        cs=cs_u,
        g_cap=g_u,
        out_cap=min(pad_gentle(max(nnz_max, 1)), prod_u),
        nnz_c=nnz_max,
        disp_bits=max(
            max(int(prod_u - p.nnz_c).bit_length(), 1) for p in live
        ),
        max_run=max(p.max_run for p in live),
        lbits=max(p.lbits for p in live),
    )
    return tuple(make_grouped_plan(s, b, fixed=unified) for s in subs)


_plan_cache: dict = {}


def _cached_plan(a: CSR, b: CSR, stream_budget, method) -> BatchedPlan:
    key = (
        id(a.rowptr), id(a.colidx), id(b.rowptr), id(b.colidx),
        stream_budget, method,
    )
    hit = _plan_cache.get(key)
    if hit is not None:
        return hit[0]
    plan = make_batched_plan(a, b, stream_budget=stream_budget, method=method)
    _plan_cache.clear()  # bound memory: these plans hold device buffers
    # hold keyed buffers: id() recycles after GC (ops/dispatch._stats)
    _plan_cache[key] = (plan, (a.rowptr, a.colidx, b.rowptr, b.colidx))
    return plan


_total_cache: dict = {}


def _cached_total(a: CSR, b: CSR) -> int:
    """Intermediate-product total, memoized on structure buffer ids: the
    per-call jit(nnz_upper_bound) dispatch cost a full ~26 ms axon round
    trip on every OOC invocation (round 4 — part of the 0.72x-of-in-core
    gap)."""
    key = (id(a.rowptr), id(a.colidx), id(b.rowptr), id(b.colidx))
    hit = _total_cache.get(key)
    if hit is not None:
        return hit[0]
    total = int(np.asarray(jax.jit(nnz_upper_bound)(a, b)).sum())
    if len(_total_cache) >= 8:
        _total_cache.pop(next(iter(_total_cache)))
    _total_cache[key] = (total, (a.rowptr, a.colidx, b.rowptr, b.colidx))
    return total


@jax.jit
def _dense_b(b: CSR):
    from .dense import csr_to_dense

    return csr_to_dense(b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_cap", "nnz_cap", "kdim", "mode", "disp_bits", "sizes", "cap"
    ),
)
def _dense_blocks_fused(
    a_vals, b, slice0, rows_e, cols_e, p1, p2, *,
    rows_cap, nnz_cap, kdim, mode, disp_bits, sizes, cap,
):
    """ALL dense blocks + B densify + assembly in ONE dispatch (round 4):
    the per-block multi-dispatch form paid the ~26 ms axon round trip 4+
    times per call — measured 72% of in-core throughput on
    dense_rows_8k_ooc, almost entirely dispatch floors. Usable whenever
    C fits HBM (the multi-dispatch path remains for true out-of-core) and
    every block shares one extraction mode.

    xs are stacked (nb, ...) block arrays; sizes are the static per-block
    exact nnz_c for the in-jit assembly concatenation.
    """
    from .chunked import _shift_compact
    from .dense import csr_to_dense

    db = csr_to_dense(b)
    vals_pad = jnp.concatenate(
        [a_vals, jnp.zeros(nnz_cap, a_vals.dtype)]
    )

    def body(_, xs):
        s0, re_i, ce_i, p1_i, p2_i = xs
        v = jax.lax.dynamic_slice(vals_pad, (s0,), (nnz_cap,))
        da = jnp.zeros((rows_cap + 1, kdim), v.dtype)
        da = da.at[re_i, ce_i].set(v, mode="drop")
        cd = jnp.matmul(
            da[:rows_cap], db, precision=jax.lax.Precision.HIGHEST
        )
        flat = cd.reshape(-1)
        if mode == "full":
            out = flat
        elif mode == "shift":
            (out,) = _shift_compact(p1_i, p2_i, [flat], disp_bits)
        else:  # gather
            guard = jnp.concatenate([flat, jnp.zeros(1, flat.dtype)])
            out = guard[jnp.clip(p1_i, 0, flat.shape[0])]
        return (), out

    nb = slice0.shape[0]
    (), outs = jax.lax.scan(
        body, (), (slice0, rows_e, cols_e, p1, p2), length=nb
    )
    parts = [outs[i, : sizes[i]] for i in range(nb)]
    vals = jnp.concatenate(parts)
    pad = cap - vals.shape[0]
    if pad > 0:
        vals = jnp.concatenate([vals, jnp.zeros(pad, vals.dtype)])
    return vals[:cap]


def spgemm_batched(
    a: CSR,
    b: CSR,
    stream_budget: int = 64 * 1024 * 1024,
    k: int | None = None,  # kept for API compat; method now auto-dispatched
    as_scipy: bool | None = None,
    method: str | None = None,
) -> "CSR | object":
    """C = A @ B with bounded peak memory (see module docstring).

    as_scipy: return a host scipy CSR instead of a device CSR container.
    None = auto: host result whenever the assembled C exceeds 2 GiB (the
    point of the out-of-core path is that C may not fit HBM)."""
    del k
    m, n = a.m, b.n
    total = _cached_total(a, b)
    if total <= stream_budget:
        return spgemm_chunked(a, b, make_chunked_plan(a, b))

    plan = _cached_plan(a, b, stream_budget, method)
    nb = len(plan.blocks)
    itemsize = np.dtype(a.vals.dtype).itemsize
    if as_scipy is None:
        as_scipy = plan.nnz_c * (4 + itemsize) > (2 << 30)

    # ---- fused single-dispatch fast path (round 4): when C fits HBM and
    # every dense block shares one extraction mode, ALL blocks + B densify
    # + assembly ride ONE jit (lax.scan over stacked block arrays) — the
    # multi-dispatch form pays the ~26 ms axon round trip per dispatch and
    # measured only 72% of in-core throughput on dense_rows_8k_ooc.
    if plan.method == "dense" and not as_scipy:
        modes = {mode for mode, _ in plan.flat_c}
        per_out = (
            plan.rows_cap * n
            if modes <= {"full", "shift"} else plan.cap_c_u
        )
        scan_bytes = len(plan.blocks) * per_out * itemsize
        if len(modes) == 1 and scan_bytes <= (1 << 30):
            mode = next(iter(modes))
            stk = getattr(plan, "_fused_stk", None)
            if stk is None:
                slice0 = jnp.asarray(np.asarray(plan.slice0, np.int32))
                rows_e = jnp.stack(plan.blk_rows_e)
                cols_e = jnp.stack(plan.blk_colidx)
                if mode == "shift":
                    p1 = jnp.stack([p[1][0] for p in plan.flat_c])
                    p2 = jnp.stack([p[1][1] for p in plan.flat_c])
                    disp_bits = max(p[1][2] for p in plan.flat_c)
                elif mode == "gather":
                    p1 = jnp.stack([p[1] for p in plan.flat_c])
                    p2 = jnp.zeros((nb, 1), jnp.int32)
                    disp_bits = 0
                else:
                    p1 = jnp.zeros((nb, 1), jnp.int32)
                    p2 = jnp.zeros((nb, 1), jnp.int32)
                    disp_bits = 0
                stk = (slice0, rows_e, cols_e, p1, p2, disp_bits)
                plan._fused_stk = stk
            slice0, rows_e, cols_e, p1, p2, disp_bits = stk
            vals = _dense_blocks_fused(
                a.vals, b, slice0, rows_e, cols_e, p1, p2,
                rows_cap=plan.rows_cap, nnz_cap=plan.nnz_cap, kdim=a.n,
                mode=mode, disp_bits=disp_bits,
                sizes=plan.nnz_c_blk, cap=plan.cap_c,
            )
            return CSR(
                rowptr=plan.out_rowptr,
                colidx=plan.out_colidx,
                vals=vals,
                shape=(m, n),
            )

    # block values: static-bound slices of the device-resident full A,
    # padded so the last block's slice stays in bounds
    vals_pad = jnp.concatenate(
        [a.vals, jnp.zeros(plan.nnz_cap, a.vals.dtype)]
    )

    blk_vals = []
    if plan.method == "dense":
        db = _dense_b(b)
        for i, (lo, hi) in enumerate(plan.blocks):
            mode, payload = plan.flat_c[i]
            out = _dense_block(
                vals_pad, plan.slice0[i], plan.blk_rows_e[i],
                plan.blk_colidx[i], db, payload,
                rows_cap=plan.rows_cap, nnz_cap=plan.nnz_cap,
                kdim=a.n, mode=mode, out_cap=plan.cap_c_u,
            )
            blk_vals.append((out, plan.nnz_c_blk[i]))
    else:
        if plan.method == "grouped":
            from .grouped import spgemm_grouped
        for i, (lo, hi) in enumerate(plan.blocks):
            v = jax.lax.dynamic_slice(
                vals_pad, (plan.slice0[i],), (plan.nnz_cap,)
            )
            a_blk = CSR(
                plan.blk_rowptr[i], plan.blk_colidx[i], v,
                (plan.rows_cap, a.n),
            )
            if plan.method == "grouped":
                c_blk = spgemm_grouped(a_blk, b, plan.grouped_scheds[i])
            else:
                c_blk = spgemm_chunked(a_blk, b, plan.chunked_plan)
            blk_vals.append((c_blk.vals, plan.nnz_c_blk[i]))
            if i % 8 == 0:
                log.info("block %d/%d dispatched", i + 1, nb)

    # ---- assembly: ONE jitted concatenation of static value slices -------
    vals = _assemble(
        tuple(v for v, _ in blk_vals),
        sizes=tuple(s for _, s in blk_vals),
        cap=plan.cap_c,
    )
    if as_scipy:
        import scipy.sparse as sp

        host_vals = np.asarray(vals)[: plan.nnz_c]
        return sp.csr_matrix(
            (host_vals, plan.host_colidx[: plan.nnz_c].copy(),
             plan.host_rowptr.astype(np.int64)),
            shape=(m, n),
        )
    return CSR(
        rowptr=plan.out_rowptr,
        colidx=plan.out_colidx,
        vals=vals,
        shape=(m, n),
    )


def _dense_block(
    vals_pad, s0, rows_e, cols_e, db, payload, *,
    rows_cap, nnz_cap, kdim, mode, out_cap=0,
):
    """One dense-MXU block: densify the A row slice (scatter-SET; padding
    entries target the guard row), matmul against the resident dense B,
    extract C values at the static structural positions. Extraction mode
    (static): 'full' identity / 'shift' monotone compaction (near-dense;
    measured faster than the one-pass scan there — see the plan builder) /
    'gather' flat positions (sparse C)."""
    del out_cap
    if mode == "shift":
        kept, disp, disp_bits = payload
        return _dense_block_jit(
            vals_pad, s0, rows_e, cols_e, db, kept, disp,
            rows_cap=rows_cap, nnz_cap=nnz_cap, kdim=kdim,
            mode=mode, disp_bits=disp_bits,
        )
    return _dense_block_jit(
        vals_pad, s0, rows_e, cols_e, db, payload, None,
        rows_cap=rows_cap, nnz_cap=nnz_cap, kdim=kdim,
        mode=mode, disp_bits=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("rows_cap", "nnz_cap", "kdim", "mode", "disp_bits"),
)
def _dense_block_jit(
    vals_pad, s0, rows_e, cols_e, db, p1, p2, *,
    rows_cap, nnz_cap, kdim, mode, disp_bits,
):
    from .chunked import _shift_compact

    v = jax.lax.dynamic_slice(vals_pad, (s0,), (nnz_cap,))
    da = jnp.zeros((rows_cap + 1, kdim), v.dtype)
    da = da.at[rows_e, cols_e].set(v, mode="drop")
    cd = jnp.matmul(
        da[:rows_cap], db, precision=jax.lax.Precision.HIGHEST
    )
    flat = cd.reshape(-1)
    if mode == "full":  # block C structurally full: identity extraction
        return flat
    if mode == "shift":
        kept, disp = p1, p2
        (out,) = _shift_compact(kept, disp, [flat], disp_bits)
        return out
    guard = jnp.concatenate([flat, jnp.zeros(1, flat.dtype)])
    return guard[jnp.clip(p1, 0, flat.shape[0])]


@functools.partial(jax.jit, static_argnames=("sizes", "cap"))
def _assemble(blk_vals, *, sizes, cap):
    parts = [v[:s] for v, s in zip(blk_vals, sizes)]
    out = jnp.concatenate(parts)
    pad = cap - out.shape[0]
    if pad > 0:
        out = jnp.concatenate([out, jnp.zeros(pad, out.dtype)])
    return out
