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
