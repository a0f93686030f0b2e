"""Per-kernel speed-of-light roofline accounting (BASELINE.json:5; SURVEY.md
§7.1): analytic bytes-moved / flops per SpGEMM stage, reported as a fraction
of HBM bandwidth and compute peak.

SpGEMM is bandwidth-bound on every architecture; the roofline here is the
honest one — minimum bytes each stage must move through HBM, divided by
measured time, versus the chip's peak.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    peak_f32_tflops: float
    peak_bf16_tflops: float
    # MEASURED platform ceilings, not published specs. Each is set just
    # ABOVE the best rate any micro or in-pipeline stage delta has ever
    # observed on this machine, so dividing work by it yields a true lower
    # bound on time (sol_fraction <= 1 by construction unless an
    # implementation beats every past observation — then re-calibrate).
    #
    # gather/scatter descriptor issue rate. Best observed: in-pipeline
    # packed (cap, 2) gather 2.28e8 desc/s (scripts/
    # profile_chunked_stages.py), al=8 table-row gather 1.82e8
    # (scripts/micro_packwidth.py), flat random/sorted 1.38e8
    # (scripts/micro_sortedgather.py), scatter-SET 1.94e8
    # (scripts/micro_scatter2.py). Ceiling: 2.4e8.
    gather_desc_per_s: float = 2.4e8
    # Pallas per-tile sort+merge lane rate. Best observed 1.45e9 lanes/s
    # (scripts/micro_tilesort.py); ceiling 1.6e9.
    tile_sort_lanes_per_s: float = 1.6e9


# TPU v5e (v5-lite) public specs: 819 GB/s HBM BW, 197 bf16 TFLOPs,
# ~98 f32-ish via MXU passes. The single chip on this machine.
TPU_V5E = ChipSpec("TPU v5e", hbm_gbps=819.0, peak_f32_tflops=98.0, peak_bf16_tflops=197.0)


@dataclasses.dataclass
class StageModel:
    name: str
    bytes_moved: float
    flops: float
    descriptors: float = 0.0  # random gather/scatter descriptors issued
    tile_lanes: float = 0.0  # Pallas tile-sort lanes processed
    # informational only (NOT used in sol_time_s): the read-once ideal
    # traffic when bytes_moved is priced at an algorithm-form floor instead
    # (currently only DIA — see dia_stage_models); keeps cross-round sol
    # comparisons honest by surfacing both bases in the report.
    ideal_bytes: float = 0.0
    # measured fixed platform cost paid regardless of work (e.g. the axon
    # tunnel's ~26 ms dispatch round-trip + ~26 ms value fetch on
    # WALL-CLOCK metrics — utils/timing.bench_delta_stats dispatch_floor);
    # device-time K-scan metrics exclude it by construction, so only
    # wall-basis models (the OOC point) set it.
    fixed_s: float = 0.0

    def sol_time_s(self, chip: ChipSpec) -> float:
        """Speed-of-light time: max of bandwidth, compute, descriptor-rate
        and tile-sort-rate bounds (each a measured platform ceiling), plus
        any measured fixed platform cost."""
        t_bw = self.bytes_moved / (chip.hbm_gbps * 1e9)
        t_fl = self.flops / (chip.peak_f32_tflops * 1e12)
        t_ds = self.descriptors / chip.gather_desc_per_s
        t_tl = self.tile_lanes / chip.tile_sort_lanes_per_s
        return max(t_bw, t_fl, t_ds, t_tl) + self.fixed_s


def spgemm_stage_models(
    nnz_a: int,
    nnz_b: int,
    m: int,
    total_products: int,
    nnz_c: int,
    itemsize: int = 4,
    index_size: int = 4,
) -> dict[str, StageModel]:
    """Minimum-traffic models for the four pipeline stages.

    F = total intermediate products; stage-3 ESC sort is log-passes of the
    (row, col, val) triple — we charge ceil(log2 F) read+write passes, the
    bitonic lower bound XLA's sort actually performs.
    """
    f = max(total_products, 1)
    log_f = max(int(np.ceil(np.log2(f))), 1)
    triple = 2 * index_size + itemsize

    return {
        # gather B row lengths at A cols + segment-sum
        "symbolic": StageModel(
            "symbolic",
            bytes_moved=nnz_a * (index_size + index_size) + m * index_size,
            flops=nnz_a,
        ),
        # write the (row, col, val) product stream + read A/B operands;
        # one packed-gather descriptor per product (narrow path)
        "expand": StageModel(
            "expand",
            bytes_moved=f * triple
            + nnz_a * (index_size + itemsize)
            + f * (index_size + itemsize),
            flops=f,
            descriptors=f,
        ),
        "sort": StageModel(
            "sort",
            bytes_moved=2 * f * triple * log_f,
            flops=f * log_f,
        ),
        # segmented merge + compaction into C
        "compress": StageModel(
            "compress",
            bytes_moved=2 * f * triple + nnz_c * (index_size + itemsize),
            flops=2 * f,
        ),
    }


def chunked_stage_models(
    plan,
    nnz_a: int,
    nnz_b: int,
    m: int,
    nnz_c: int,
    itemsize: int = 4,
) -> dict[str, StageModel]:
    """PLAN-AWARE speed-of-light for ops/chunked.spgemm_chunked: charges the
    descriptor/byte/pass counts of the pipeline the plan actually selects
    (narrow per-pair vs al-aligned table rows vs 128-lane wide rows), each
    at the measured platform ceiling (ChipSpec docstring). The round-1
    generic model charged one descriptor per product regardless of plan —
    aligned/wide plans do provably fewer, which made their sol_time
    OVERestimates and sol_fraction > 1 (VERDICT r1 weak #2).

    Elem size: products ride as (key, val) = 8 B when the plan packs keys
    (pack_u32/int31), 12 B for the 3-operand sort.
    """
    stream = plan.prod_cap  # padded product slots actually sorted
    log_s = max(int(np.ceil(np.log2(max(stream, 2)))), 1)
    elem = 8 if itemsize == 4 else 4 + 2 * itemsize  # packed key + val

    # --- metadata: propagation scatters (nnz_a desc each) + row-granularity
    # scatters (m desc) + rowptr-pair gathers (nnz_a desc) + cumsums -------
    n_props = 3 if not plan.al else 3  # posb/remb/aval (or posb/aval + rend)
    meta = StageModel(
        "metadata",
        bytes_moved=2.0 * n_props * 4 * (plan.chunks_cap + plan.nchunks_cap),
        flops=0.0,
        descriptors=float((n_props + 1) * nnz_a + 2 * m),
    )

    # --- expansion: one descriptor per gather ROW -------------------------
    if plan.al:
        desc = float(plan.chunks_cap)  # al pairs per descriptor
        desc += float(plan.abpad_cap)  # in-graph aligned-table build gather
        desc += float(plan.nchunks_cap)  # mixed-mode narrow substream (k=1)
    else:
        desc = float(plan.chunks_cap * plan.k)  # k independent lanes/chunk
    if plan.wide_min:
        desc += float(plan.wchunks_cap)  # one desc per 128-lane table row
        desc += 2.0 * nnz_b  # padded-B scatter build (cols + vals)
    expand = StageModel(
        "expand",
        bytes_moved=float(stream) * elem + 2.0 * 4 * nnz_b,
        flops=float(stream),
        descriptors=desc,
    )

    # --- sort: bitonic lower-bound passes at HBM bandwidth ----------------
    sort = StageModel(
        "sort", bytes_moved=2.0 * stream * elem * log_s, flops=0.0
    )

    # --- runsum: log2(max_run) shift-add passes ---------------------------
    run_passes = max(int(max(plan.max_run, 2) - 1).bit_length(), 1)
    runsum = StageModel(
        "runsum",
        bytes_moved=2.0 * stream * elem * run_passes,
        flops=float(stream) * run_passes,
    )

    # --- compaction: disp_bits conditional-shift passes + rowptr gather ---
    c_passes = min(plan.disp_bits or log_s, log_s)
    compact = StageModel(
        "compact",
        bytes_moved=2.0 * stream * elem * c_passes
        + nnz_c * (4 + itemsize),
        flops=0.0,
        descriptors=float(m + 1),
    )
    return {
        "metadata": meta,
        "expand": expand,
        "sort": sort,
        "runsum": runsum,
        "compact": compact,
    }


def tilepack_stage_models(
    plan,
    nnz_a: int,
    nnz_b: int,
    m: int,
    nnz_c: int,
    itemsize: int = 4,
) -> dict[str, StageModel]:
    """PLAN-AWARE speed-of-light for ops/tilepack.spgemm_tilepack. Stages
    mirror the module docstring's pipeline; rates are the measured platform
    ceilings (ChipSpec docstring). Products ride as (key, val) = 8 B."""
    lanes = plan.t_cap * plan.w
    slots = plan.s_cap
    elem = 4 + itemsize

    meta = StageModel(
        "metadata",
        bytes_moved=2.0 * 2 * 4 * slots,  # posb/aval cumsums over slots
        flops=0.0,
        descriptors=float(3 * nnz_a + 3 * m),  # 2 props + pair gather + row
    )
    expand = StageModel(
        "expand",
        bytes_moved=float(lanes) * elem + 2.0 * 4 * nnz_b,
        flops=float(lanes),
        # slot gathers (al pairs/desc) + in-graph aligned-table build
        descriptors=float(slots + plan.abpad_cap),
    )
    kernel = StageModel(
        "tile_sort_merge",
        bytes_moved=2.0 * lanes * elem,  # one HBM read + one write
        flops=0.0,
        tile_lanes=float(lanes),
    )
    log_l = max(int(np.ceil(np.log2(max(lanes, 2)))), 1)
    c_passes = min(plan.disp_bits or log_l, log_l)
    compact = StageModel(
        "compact",
        bytes_moved=2.0 * lanes * elem * c_passes + nnz_c * (4 + itemsize),
        flops=0.0,
        descriptors=float(m + 1),
    )
    return {
        "metadata": meta,
        "expand": expand,
        "tile_sort_merge": kernel,
        "compact": compact,
    }


def grouped_stage_models(
    plan,
    nnz_a: int,
    nnz_b: int,
    m: int,
    nnz_c: int,
    itemsize: int = 4,
) -> dict[str, StageModel]:
    """PLAN-AWARE speed-of-light for ops/grouped.spgemm_grouped. The 2D
    per-group sort's bitonic lower bound is log2(group width) read+write
    passes — the grouped path's whole point is that this is far below the
    global sort's log2(stream) (chunked_stage_models convention). Products
    ride as (u32 key, f32 val) = 8 B (the plan guarantees packability)."""
    stream = plan.prod_cap
    W = plan.cs * plan.lanes
    log_w = max(int(np.ceil(np.log2(max(W, 2)))), 1)

    meta = StageModel(
        "metadata",
        # posb + aval cumsums over the chunk-slot stream
        bytes_moved=2.0 * 2 * 4 * plan.s_cap,
        flops=0.0,
        # 2 propagation scatters + rowptr-pair gather + spread scatter
        # (nnz_a each) + rank scatter (m) + boundary injections (2 g_cap)
        descriptors=float(4 * nnz_a + m + 2 * plan.g_cap),
    )
    desc = float(plan.s_cap)
    if plan.al:
        desc += float(plan.abpad_cap)  # in-graph aligned-table build
    expand = StageModel(
        "expand",
        bytes_moved=float(stream) * 8 + 2.0 * 4 * nnz_b,
        flops=float(stream),
        descriptors=desc,
    )
    sort = StageModel(
        "sort", bytes_moved=2.0 * stream * 8 * log_w, flops=0.0
    )
    run_passes = max(int(max(plan.max_run, 2) - 1).bit_length(), 1)
    runsum = StageModel(
        "runsum",
        bytes_moved=2.0 * stream * 8 * run_passes,
        flops=float(stream) * run_passes,
    )
    c_passes = max(plan.disp_bits, 1)
    compact = StageModel(
        "compact",
        bytes_moved=2.0 * stream * 8 * c_passes + nnz_c * (4 + itemsize),
        flops=0.0,
        descriptors=float(m + 1),
    )
    return {
        "metadata": meta,
        "expand": expand,
        "sort": sort,
        "runsum": runsum,
        "compact": compact,
    }


def dia_stage_models(
    nd_a: int, nd_c: int, n: int, itemsize: int = 4
) -> dict[str, StageModel]:
    """DIA SpGEMM (ops/dia.py): C planes are static-shift FMAs of A-plane
    pairs (2 flops/slot over nd_a^2 length-n term products).

    Traffic is priced at the GATHER FORM'S irreducible movement — every
    output plane independently re-reads its nd_a A-slices and B-planes
    from HBM (2 streams per term) plus one write per C plane — NOT at the
    read-each-plane-once ideal. The ideal requires keeping all planes
    VMEM-resident per column block; a Pallas kernel attempting that
    (ops/dia_pallas) measured SLOWER at small n and crashes Mosaic at
    nd >= ~25 (2026-08-20 A/B), so per-term re-reads are the platform
    floor and the old bound made sol fractions meaningless (0.036-0.23,
    VERDICT r2 weak #3)."""
    return {
        "plane_fma": StageModel(
            "plane_fma",
            bytes_moved=(2 * nd_a * nd_a + nd_c) * n * itemsize,
            flops=2.0 * nd_a * nd_a * n,
            # the read-each-plane-once ideal, reported alongside so round-2
            # (ideal-based) and round-3+ (gather-form) sol fractions aren't
            # silently compared on different bases (ADVICE r3)
            ideal_bytes=(2 * nd_a + nd_c) * n * itemsize,
        ),
    }


def bsr_stage_models(
    pairs: int,
    nnzb_a: int,
    nnzb_b: int,
    nnzb_c: int,
    block_shape: tuple[int, int] = (8, 128),
    bn: int = 128,
    itemsize: int = 4,
) -> dict[str, StageModel]:
    """BSR x BSR SpGEMM (ops/bsr.py): batched (bm,bk)x(bk,bn) MXU matmuls
    over block pairs + segment-sum into C blocks. Minimum traffic: each
    distinct block read/written ONCE (the implementation materializes
    per-pair streams — headroom vs this bound is real fusion headroom).
    Flops charged at 3x: f32 precision=HIGHEST runs ~3 MXU passes.

    Descriptor pricing (round 5, scripts/ab_bsr_stages.py K-scan prefix
    deltas on dense_rows_2k): the path is DESCRIPTOR-floor-bound, not
    bandwidth-bound — the metadata prefix alone measured 1.56 ms of the
    2.42 ms total at 65k pairs when metadata rode 3-4 separate per-pair
    gather chains. Packing them into ONE (P, 3) entry-table gather
    (ops/bsr.py ent_tbl) halved the point to 1.19 ms = 30.9 GF
    (2026-08-21), landing at ~4.4 streams/pair; the model prices the 4
    structural ones (packed meta, b.colidx, and the two block-payload
    gathers; the C-block scatter-add rides the same budget). The prefix
    A/B also reproduced the CLAUDE.md probe trap: consuming block
    outputs as scan outputs forces the 19 ms materialized form — the
    fused production form is the honest denominator."""
    bm, bk = block_shape
    return {
        "block_matmul": StageModel(
            "block_matmul",
            bytes_moved=(nnzb_a * bm * bk + nnzb_b * bk * bn
                         + nnzb_c * bm * bn) * itemsize,
            flops=3.0 * 2.0 * pairs * bm * bk * bn,
            descriptors=4.0 * pairs,
        ),
    }


def dense_stage_models(
    m: int, k: int, n: int, nnz_a: int, nnz_c: int, itemsize: int = 4
) -> dict[str, StageModel]:
    """Dense-MXU SpGEMM (ops/dense.py): scatter A into a dense (m,k), full
    matmul at f32-HIGHEST, extract the nnz_c structural entries."""
    return {
        "scatter_in": StageModel(
            "scatter_in",
            bytes_moved=2 * nnz_a * (2 * 4 + itemsize) + m * k * itemsize,
            flops=0.0,
            descriptors=2.0 * nnz_a,
        ),
        "matmul": StageModel(
            "matmul",
            bytes_moved=(m * k + k * n + m * n) * itemsize,
            # f32 HIGHEST runs ~3 MXU passes of the bf16 rate (measured
            # ~30 TF/s, ops/dispatch.MXU_F32_HIGHEST_FLOPS): charge the
            # flops it actually executes so sol reflects the chosen
            # precision, not a bf16 ceiling it must not use
            flops=3.0 * 2.0 * m * k * n,
        ),
        "extract": StageModel(
            "extract",
            # mode-aware (ops/dense.make_dense_plan, round-5 measured A/B):
            # near-full C runs log2(holes) shift passes (cheaper than the
            # one-pass scan's dus machinery there); sparse C runs the
            # one-pass scan on constant keys
            bytes_moved=(
                0.0 if m * n == nnz_c else (
                    max(int(m * n - nnz_c).bit_length(), 1)
                    * m * n * 2 * itemsize
                    if (m * n - nnz_c) < (m * n) // 8
                    else m * n * (4 + itemsize) + nnz_c * itemsize
                )
            ),
            flops=0.0,
        ),
    }


def batched_dense_stage_models(
    plan, kdim: int, n: int, nnz_a: int, itemsize: int = 4
) -> dict[str, StageModel]:
    """Priced stages for the dense-method batched plan: per-block densify
    scatter + MXU matmul + static extraction, plus one B densification and
    the single-pass value assembly."""
    nb = len(plan.blocks)
    flops = 3.0 * 2.0 * nb * plan.rows_cap * kdim * n  # f32-HIGHEST passes
    bytes_blocks = 0.0
    for i, (lo, hi) in enumerate(plan.blocks):
        bytes_blocks += plan.rows_cap * kdim * itemsize  # A block write+read
        bytes_blocks += plan.rows_cap * n * itemsize  # C block write
        mode = plan.flat_c[i][0] if plan.flat_c else "gather"
        if mode == "shift":
            disp_bits = plan.flat_c[i][1][2]
            bytes_blocks += (
                disp_bits * plan.rows_cap * n * 2 * itemsize
            )  # log(holes) shift passes
        elif mode == "gather":
            bytes_blocks += plan.nnz_c_blk[i] * 2 * itemsize
    desc = float(nnz_a)  # densify scatters
    gather_desc = sum(
        plan.nnz_c_blk[i]
        for i in range(nb)
        if plan.flat_c and plan.flat_c[i][0] == "gather"
    )
    return {
        "densify_b": StageModel(
            "densify_b",
            bytes_moved=float(kdim) * n * itemsize,
            flops=0.0,
            descriptors=0.0,
        ),
        "blocks": StageModel(
            "blocks",
            bytes_moved=bytes_blocks,
            flops=flops,
            descriptors=desc + gather_desc,
        ),
        "assembly": StageModel(
            "assembly",
            bytes_moved=2.0 * plan.nnz_c * itemsize,
            flops=0.0,
        ),
        # the OOC point is a WALL metric by definition (host orchestration
        # included): one fused dispatch + one value fetch each pay the
        # measured ~26 ms axon-tunnel round trip (round-4 decomposition:
        # 144 ms wall = 26 issue + ~92 exec + 26 fetch) — a platform
        # constant of this host that no device-stage pricing can remove
        "dispatch_wall": StageModel(
            "dispatch_wall", bytes_moved=0.0, flops=0.0, fixed_s=0.052,
        ),
    }


def roofline_report(
    stage_models: dict[str, StageModel],
    stage_times_s: dict[str, float] | None = None,
    total_time_s: float | None = None,
    chip: ChipSpec = TPU_V5E,
) -> dict:
    """Fraction-of-speed-of-light per stage (and end-to-end if total given)."""
    report = {}
    sol_total = 0.0
    for name, sm in stage_models.items():
        sol = sm.sol_time_s(chip)
        sol_total += sol
        entry = {
            "bytes": sm.bytes_moved,
            "flops": sm.flops,
            "sol_time_s": sol,
        }
        if sm.ideal_bytes:
            entry["ideal_bytes"] = sm.ideal_bytes
            entry["ideal_sol_time_s"] = max(
                sm.ideal_bytes / (chip.hbm_gbps * 1e9),
                sm.flops / (chip.peak_f32_tflops * 1e12),
            )
        if stage_times_s and name in stage_times_s:
            t = stage_times_s[name]
            entry["time_s"] = t
            entry["sol_fraction"] = sol / t if t > 0 else 0.0
            entry["achieved_gbps"] = sm.bytes_moved / t / 1e9 if t > 0 else 0.0
        report[name] = entry
    report["_total"] = {"sol_time_s": sol_total, "chip": chip.name}
    if total_time_s:
        report["_total"]["time_s"] = total_time_s
        report["_total"]["sol_fraction"] = sol_total / total_time_s
    return report
