"""Cost-model method dispatch for C = A @ B — the stage-2 analogue.

The reference decides per-ROW which numeric kernel runs (38-bin binning,
SURVEY.md §4 stage 2). On TPU the same decision is better taken per-MATRIX
and per-FORMAT: the four backends have qualitatively different cost shapes,
all measured on the v5-lite chip with the full-output probe (2026-08-17):

  chunked  sort/gather ESC      ~15 ns / intermediate product (gather wall)
  bsr      MXU block matmul     ~50 ns / (8,128)x(128,128) block pair
  dia      static-shift vectors ~0.1 ns / plane slot + ~25 us per diagonal
  dense    full-MXU matmul      mknx2 flops at ~30 TF/s (f32 HIGHEST)
                                + scatter-in + shift-compaction extract

``choose_method`` estimates each and returns the argmin — one host-side
O(nnz) numpy pass at plan time, like the reference's host-side binning.

All estimators take an (A, B) pair (B defaults to A, the reference's
C = A @ A squaring mode): the AMG Galerkin triple product R·A·P
(models/amg.py, acceptance config #3) routes its rectangular chained
products through the exact same cost models.
"""
from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR, host_view

# measured constants (see BASELINE.md history; re-calibrate on new hardware).
# 2026-08-18 delta-timing recalibration: the old *_FIXED_S of 2.5-3.3 ms were
# NOT body cost — they were the ~26 ms axon dispatch round-trip / K=8 leaking
# into wall/K quotients (utils/timing.bench_delta cancels it). True
# per-invocation fixed costs are < 0.1 ms. Delta-timed calibration points:
#   poisson2d_256  dia 0.149 ms (nd=5,  n=65536) | model 0.26
#   stencil27_32   dia 3.02  ms (nd=27, n=32768) | model 3.00
#   banded_16k     bsr 0.233 ms (~7.6k pairs)    | model 0.30
#   dense_rows_2k  bsr 2.38  ms (~66k pairs)     | model 2.33
CHUNKED_NS_PER_PRODUCT = 9.5  # K-scan remeasure 2026-08-19: er (al8) 9.6,
# circuit (k1+wide) 8.5, powerlaw (k1) 10.7 ns/product (true)
# — all with a single-int32 sort key. Matrices whose (m, n) miss both the
# int31 and uint32 packs run a 3-operand 2-key sort and wider compaction
# ops; measured (k=1 rem-free era, 2026-08-19): econ_206k 17.3 ns/p,
# scircuit_256k 13.3, webbase_1m 22.2 — the m-sized scatters add a
# 169 * m / products ns/product tail (3-point fit, error < 4%).
CHUNKED_NS_PER_PRODUCT_UNPACKED = 12.6
CHUNKED_NS_M_TAIL = 169.0
CHUNKED_FIXED_S = 0.1e-3
BSR_NS_PER_PAIR = 35.0
BSR_FIXED_S = 0.03e-3
DENSE_FIXED_S = 0.3e-3
# DIA recalibrated 2026-08-19 after the gather-form rewrite (ops/dia.py:
# per-output-plane term sums, no accumulator read-modify-write). Delta-timed
# points: poisson2d_256 25 us (1.64M slots, 15.3 ps/slot), banded_16k
# 156 us (10.2M, 15.2), stencil27_32 386 us (23.9M, 16.2), mc2depi_524k
# 282 us (13.1M, 21.5 — large-n HBM tail). Consequence: banded regimes now
# dispatch to dia (131 GF measured vs bsr's 87.5 on banded_16k).
DIA_FIXED_S = 0.02e-3
DIA_NS_PER_SLOT = 0.018
DIA_OP_OVERHEAD_S = 1.5e-6
MXU_F32_HIGHEST_FLOPS = 3.0e13
# descriptor-bound like gathers: measured ~138 M desc/s (CLAUDE.md)
SCATTER_DESC_PER_S = 1.38e8
HBM_BYTES_PER_S = 8.0e11
DENSE_MEM_BYTES = 1 << 30
DIA_PLANE_BYTES = 512 << 20
BSR_PAIR_BYTES = 2 << 30


def _mstats(x: CSR, _cache={}):
    """One host pull of (rowptr, colidx) + per-matrix derived stats,
    memoized on the CSR object's buffer ids: choose_method calls seven
    estimators and each device->host pull of a 1M-row matrix costs ~10 s
    through the axon tunnel (measured 2026-08-19: choose_method(webbase_1m)
    66 s -> 13 s). A small LRU (AMG hierarchies cycle A/P/R per level)."""
    key = (id(x.rowptr), id(x.colidx))
    hit = _cache.get(key)
    if hit is not None:
        # true LRU: refresh recency on hit (plain pop-front is FIFO and an
        # AMG hierarchy cycling >8 matrices would evict its hot entries)
        _cache[key] = _cache.pop(key)
        return hit[0]
    rowptr = host_view(x.rowptr)
    nnz = int(rowptr[-1])
    row_lens = np.diff(rowptr).astype(np.int64)
    cols = host_view(x.colidx)[:nnz].astype(np.int64)
    if len(_cache) >= 8:
        _cache.pop(next(iter(_cache)))
    # hold the keyed buffers: id() values recycle after GC, and a stale hit
    # returns another matrix's stats (caught by test_choose_method_regimes)
    _cache[key] = ((rowptr, nnz, row_lens, cols), (x.rowptr, x.colidx))
    return _cache[key][0]


def _stats(a: CSR, b: CSR | None = None):
    """Pair stats for C = A @ B: A's host arrays + the intermediate-product
    count sum_i |B[A.colidx[i], :]| (== the flop count / 2)."""
    b = a if b is None else b
    a_rowptr, nnz_a, a_row_lens, a_cols = _mstats(a)
    _, _, b_row_lens, _ = _mstats(b)
    products = int(b_row_lens[a_cols].sum()) if nnz_a else 0
    return a_rowptr, nnz_a, a_row_lens, a_cols, products


def estimate_chunked_s(
    a: CSR, b: CSR | None = None, products: int | None = None
) -> float:
    b = a if b is None else b
    if products is None:
        *_, products = _stats(a, b)
    from .chunked import _rc_pack_bits

    m, n = a.m, b.n
    cbits = max(int(max(n - 1, 1)).bit_length(), 1)
    rbits = max(int(max(m - 1, 1)).bit_length(), 1)
    packed = _rc_pack_bits(m, n) > 0 or cbits + rbits <= 32
    if packed:
        ns = CHUNKED_NS_PER_PRODUCT
    else:
        ns = CHUNKED_NS_PER_PRODUCT_UNPACKED + CHUNKED_NS_M_TAIL * m / max(
            products, 1
        )
    return CHUNKED_FIXED_S + products * ns * 1e-9


def estimate_bsr_s(
    a: CSR, b: CSR | None = None, block_shape=(8, 128), bn: int = 128
) -> float:
    """Block-pair count model (mirrors ops/bsr.bsr_viable): A blocked at
    (bm, bk), B at (bk, bn) as in ops/bsr.spgemm_bsr."""
    b = a if b is None else b
    bm, bk = block_shape
    if a.m % bm or a.n % bk or b.m % bk or b.n % bn:
        return float("inf")
    a_rowptr, nnz_a, _, a_cols = _mstats(a)
    b_rowptr, nnz_b, _, b_cols = _mstats(b)
    if not nnz_a or not nnz_b:
        return 0.0
    a_rows = np.repeat(np.arange(a.m, dtype=np.int64), np.diff(a_rowptr))
    a_keys = np.unique((a_rows // bm) * (a.n // bk) + a_cols // bk)
    b_rows = np.repeat(np.arange(b.m, dtype=np.int64), np.diff(b_rowptr))
    b_keys = np.unique((b_rows // bk) * (b.n // bn) + b_cols // bn)
    b_blen = np.bincount(b_keys // (b.n // bn), minlength=b.m // bk)
    pairs = int(b_blen[a_keys % (a.n // bk)].sum())
    if pairs * bm * bk * 4 > BSR_PAIR_BYTES:
        return float("inf")
    return BSR_FIXED_S + pairs * BSR_NS_PER_PAIR * 1e-9


def _dia_offsets(x: CSR) -> np.ndarray:
    rowptr, nnz, _, cols = _mstats(x)
    if not nnz:
        return np.zeros(0, np.int64)
    rows = np.repeat(np.arange(x.m, dtype=np.int64), np.diff(rowptr))
    return np.unique(cols - rows)


def estimate_dia_s(a: CSR, b: CSR | None = None) -> float:
    b = a if b is None else b
    _, nnz_a, *_ = _mstats(a)
    _, nnz_b, *_ = _mstats(b)
    if not nnz_a or not nnz_b:
        return 0.0
    offs_a = _dia_offsets(a)
    offs_b = offs_a if b is a else _dia_offsets(b)
    nd_a, nd_b = len(offs_a), len(offs_b)
    # early out before the O(nd_a*nd_b) offset-sum table: many-diagonal
    # matrices can never win on the nd_a*nd_b*n cost (and the table itself
    # would be huge)
    # nd_a * nd_b is also the number of slice-FMA ops in the jitted graph
    # (dia_spgemm unrolls terms statically): cap it so auto dispatch never
    # builds a minutes-to-compile XLA program (each op also costs
    # DIA_OP_OVERHEAD_S at runtime). Round-4 recalibration: 9801 terms
    # compile in ~70 s ONE-TIME (persistent cache) and the slot model
    # stays exact — pdb_8k measured 1.44 ms vs 1.45 modeled, a 122x win
    # over grouped (scripts/ab_fem_dia.py), so the flat 8192 cap cost the
    # whole FEM-regular band. The cap now scales with the work at stake:
    # a >8192-term compile (~1-2 min) is only accepted when the product
    # stream is large enough (>= 4M products ~ tens-of-ms alternatives)
    # that the per-call win amortizes it; tiny products (e.g. AMG's
    # tall-skinny P with O(m) diagonals) keep the strict cap.
    *_, products = _stats(a, b)
    term_cap = 16384 if products >= (1 << 22) else 8192
    if (
        nd_a * nd_b * b.n * DIA_NS_PER_SLOT * 1e-9 > 10.0
        or nd_a > 4096
        or nd_b > 4096
        or nd_a * nd_b > term_cap
    ):
        return float("inf")
    n_off_c = len(np.unique(offs_a[:, None] + offs_b[None, :]))
    itemsize = np.dtype(a.vals.dtype).itemsize
    if n_off_c * b.n * itemsize > DIA_PLANE_BYTES:
        return float("inf")
    # per-term slice-FMA op overhead amortizes over the plane sums; the
    # A@A-calibrated nd * OVERHEAD generalizes as terms / max(nd_a, nd_b)
    return (
        DIA_FIXED_S
        + nd_a * nd_b * b.n * DIA_NS_PER_SLOT * 1e-9
        + (nd_a * nd_b / max(nd_a, nd_b, 1)) * DIA_OP_OVERHEAD_S
    )


def estimate_dense_s(a: CSR, b: CSR | None = None) -> float:
    b = a if b is None else b
    m, k = a.shape
    n = b.n
    itemsize = np.dtype(a.vals.dtype).itemsize
    if (m * k + k * n + m * n) * itemsize > DENSE_MEM_BYTES:
        return float("inf")
    _, nnz_a, *_ = _mstats(a)
    _, nnz_b, *_ = _mstats(b)
    matmul_s = 2.0 * m * k * n / MXU_F32_HIGHEST_FLOPS
    scatter_s = (nnz_a + nnz_b) / SCATTER_DESC_PER_S
    # extraction: ~log2(holes) conditional-shift passes over the dense C
    passes = max(int(m * n).bit_length() - 8, 1)  # holes unknown pre-plan
    compact_s = passes * (m * n * (2 * itemsize + 1)) / HBM_BYTES_PER_S
    return DENSE_FIXED_S + matmul_s + scatter_s + compact_s


def estimate_tilepack_s(a: CSR, b: CSR | None = None) -> float:
    """Packed-tile ESC model (ops/tilepack.py) priced off the EXACT plan
    (the regime gate rejects long-row matrices before the greedy fill, so
    building it here is cheap where it matters). Stage terms measured
    on-chip: 2 propagation scatters ~130 M desc/s, table + slot gathers
    ~194-228 M desc/s, shift compaction ~0.075 ns per lane per
    displacement-bit pass. The Pallas kernel's per-lane cost carries the
    bitonic stage count AND its per-local-row count loop — fit on
    er_medium (w=1024, wlr_eff=8, kernel ~2.05 ns/lane, total 65.8 ms)
    and econ_206k (w=256, wlr_eff=16, ~3.15 ns/lane, total 98.3 ms),
    2026-08-19; the w=128 micro (1.25 G lanes/s) falls on the same line."""
    b = a if b is None else b
    _, nnz, *_rest, products = _stats(a, b)
    if not nnz:
        return 0.0
    if products > (1 << 27):
        return float("inf")
    from .tilepack import make_tilepack_plan

    sched = make_tilepack_plan(a, b)
    if sched is None:
        return float("inf")
    p = sched.plan
    lanes = p.t_cap * p.w
    lw = max(int(p.w - 1).bit_length(), 1)
    kernel_ns = 0.0122 * lw * (lw + 1) / 2 + 0.173 * p.wlr_eff
    passes = max(int(max(lanes // 4, 1)).bit_length(), 1)
    return (
        CHUNKED_FIXED_S
        + 2 * nnz / 1.30e8
        + p.abpad_cap / 2.28e8
        + p.s_cap / 1.94e8
        + lanes * kernel_ns * 1e-9
        + passes * lanes * 0.075e-9
    )


def estimate_hash_s(
    a: CSR, b: CSR | None = None, tile_bytes_budget: int = 512 * 1024 * 1024
) -> float:
    """Dense-accumulator hash path model (ops/hash.py): every product is one
    scatter-add descriptor into the (R, n) accumulator plus one scatter-SET
    into the occupancy mask, then each row tile pays an (R, n) prefix-sum
    sweep and two (R, n)-descriptor compaction scatters. Rates are the
    measured scatter ceilings (CLAUDE.md: add ~1.30e8 desc/s, SET ~1.94e8;
    cumsum ~0.8 ns/slot).

    Measured conclusion (2026-08-19, kept so the dispatcher documents it):
    scattering F products costs MORE than gathering them (adds never beat
    1.38e8 desc/s while the chunked path's aligned gathers reach 2.28e8
    with 8 pairs per descriptor), so on this TPU the hash path only
    approaches the sort paths at extreme duplicate ratios (F >> m*n) where
    the BSR/MXU path has long since taken over — the reference's
    shared-memory hash method has no winning TPU regime, but the dispatcher
    can now prove that per matrix instead of ignoring the method.

    Round-4 adversarial sweep (scripts/sweep_hash_adversarial.py,
    results.jsonl hash_sweep rows, 2026-08-20): on the family hash was
    built for — F >> m*n with dense/BSR infeasible (m=32k, n swept
    2048/512/128, dup ratios 1.0/3.8/12.6, ~53-66M products) — the
    host-orchestrated hash path measured 20.5-22.4 s wall vs grouped's
    171-279 ms device: 75-120x SLOWER, the gap WIDENING with duplicate
    ratio. The claim is now a recorded measurement, not an argument."""
    b = a if b is None else b
    rowptr, nnz, _, _, products = _stats(a, b)
    if not nnz:
        return 0.0
    m, n = a.m, b.n
    itemsize = np.dtype(a.vals.dtype).itemsize
    r_tile = max(int(tile_bytes_budget // (n * (itemsize + 4 + 4))), 8)
    m_ne = int((np.diff(rowptr) > 0).sum())
    n_tiles = -(-m_ne // max(min(r_tile, m_ne), 1)) if m_ne else 0
    slots = n_tiles * min(r_tile, max(m_ne, 1)) * n
    return (
        CHUNKED_FIXED_S * max(n_tiles, 1)  # host-orchestrated dispatches
        + products / 1.30e8  # value scatter-add
        + products / 1.94e8  # occupancy scatter-SET
        + products / 2.28e8  # product expansion gathers
        + slots * 0.8e-9  # per-tile prefix-sum sweep
        + 2 * slots / 1.4e8  # cols/vals compaction scatters
    )


def estimate_grouped_s(a: CSR, b: CSR | None = None) -> float:
    """Grouped-ESC model (ops/grouped.py): best of the narrow / aligned
    modes under the shared calibrated cost (grouped.estimate_mode_ns)."""
    from .grouped import estimate_mode_ns

    b = a if b is None else b
    rowptr, nnz, _, cols, products = _stats(a, b)
    if not nnz or products == 0:
        return 0.0
    if products > (1 << 27):
        return float("inf")
    dtype = str(a.vals.dtype)
    if dtype not in ("float32", "bfloat16", "float16", "float64"):
        return float("inf")  # value bits must pack into int32 lanes
    m, n = a.m, b.n
    if max(int(n - 1).bit_length(), 1) > 31:
        return float("inf")
    _, _, b_row_lens, _ = _mstats(b)
    lens = b_row_lens[cols]
    cost = estimate_mode_ns(m, nnz, products, products, 0)
    for cand in (2, 4, 8):
        abpad_c = int((-(-b_row_lens // cand) * cand).sum())
        slots_c = int((-(-lens // cand)).sum()) * cand
        # mirror make_grouped_plan's table-build memory guard
        if abpad_c // cand > (512 << 10 if cand < 8 else 2 << 20):
            continue
        cost = min(
            cost,
            estimate_mode_ns(m, nnz, slots_c, slots_c // cand, abpad_c),
        )
    if dtype == "float64":
        # double-word lane: values ride two int32 lanes (3-operand sort,
        # doubled value traffic, emulated-f64 multiply/run-sum)
        cost *= 2.2
    return CHUNKED_FIXED_S + cost * 1e-9


def choose_method(a: CSR, b: CSR | None = None) -> str:
    """Pick the fastest backend for C = A @ B by measured cost model
    (B defaults to A — the reference's squaring benchmark mode)."""
    b = a if b is None else b
    *_, products = _stats(a, b)
    if products == 0:
        return "chunked"  # degenerate product; every estimate ties at ~0
    est = {
        "chunked": estimate_chunked_s(a, b, products),
        "bsr": estimate_bsr_s(a, b),
        "dia": estimate_dia_s(a, b),
        "dense": estimate_dense_s(a, b),
        "tilepack": estimate_tilepack_s(a, b),
        "grouped": estimate_grouped_s(a, b),
        "hash": estimate_hash_s(a, b),
    }
    return min(est, key=est.get)
