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
    # MEASURED platform limit, not a published spec: XLA random-gather
    # descriptor rate (~125 M desc/s for narrow packed gathers on this
    # machine, scripts/micro_rowgather.py) — the actual bound on
    # gather-based expansion, far below the byte-bandwidth bound.
    gather_desc_per_s: float = 125e6


# TPU v5e (v5-lite) public specs: 819 GB/s HBM BW, 197 bf16 TFLOPs,
# ~98 f32-ish via MXU passes. The single chip on this machine.
TPU_V5E = ChipSpec("TPU v5e", hbm_gbps=819.0, peak_f32_tflops=98.0, peak_bf16_tflops=197.0)


@dataclasses.dataclass
class StageModel:
    name: str
    bytes_moved: float
    flops: float
    descriptors: float = 0.0  # random-gather descriptors issued

    def sol_time_s(self, chip: ChipSpec) -> float:
        """Speed-of-light time: max of bandwidth, compute and (measured)
        gather-descriptor-rate bounds."""
        t_bw = self.bytes_moved / (chip.hbm_gbps * 1e9)
        t_fl = self.flops / (chip.peak_f32_tflops * 1e12)
        t_ds = self.descriptors / chip.gather_desc_per_s
        return max(t_bw, t_fl, t_ds)


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


def dia_stage_models(
    nd_a: int, nd_c: int, n: int, itemsize: int = 4
) -> dict[str, StageModel]:
    """DIA SpGEMM (ops/dia.py): C planes are static-shift FMAs of A-plane
    pairs. Minimum traffic: read the nd_a input planes once, write the nd_c
    output planes once; each of the nd_a^2 offset pairs is one length-n FMA
    (2 flops/slot). No gathers — offsets are compile-time structure."""
    return {
        "plane_fma": StageModel(
            "plane_fma",
            bytes_moved=(nd_a + nd_c) * n * itemsize,
            flops=2.0 * nd_a * nd_a * n,
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
    Flops charged at 3x: f32 precision=HIGHEST runs ~3 MXU passes."""
    bm, bk = block_shape
    return {
        "block_matmul": StageModel(
            "block_matmul",
            bytes_moved=(nnzb_a * bm * bk + nnzb_b * bk * bn
                         + nnzb_c * bm * bn) * itemsize,
            flops=3.0 * 2.0 * pairs * bm * bk * bn,
            descriptors=2.0 * pairs,  # pair-stream gathers of A/B block ids
        ),
    }


def dense_stage_models(
    m: int, k: int, n: int, nnz_a: int, nnz_c: int, itemsize: int = 4
) -> dict[str, StageModel]:
    """Dense-MXU SpGEMM (ops/dense.py): scatter A into a dense (m,k), full
    matmul at f32-HIGHEST, extract the nnz_c structural entries."""
    log_holes = max(int(np.ceil(np.log2(max(m * n - nnz_c, 2)))), 1)
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
            bytes_moved=log_holes * m * n * itemsize
            + nnz_c * (4 + itemsize),
            flops=0.0,
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
