"""Headline benchmark: C = A @ A GFlops on the synthetic SuiteSparse-regime
suite, 1 TPU chip. Prints ONE JSON line.

Metric definitions (BASELINE.md): flops = 2 * sum_i nnzCt[i] (stage-1
intermediate-product count), GFlops = flops / time / 1e9. The timed call is
the full 4-stage pipeline (symbolic + on-device binning/chunk-mapping +
numeric + compaction) in one jitted dispatch — matching the reference
driver's semantics (SURVEY.md §4: warmup, then timed runs, mean). The
shape plan (static buffer capacities) is built once per matrix profile
outside the loop, the analogue of the reference's compile-time common.h
bin constants + initData allocation, which its timed loop also excludes.

vs_baseline: no numbers could be extracted from the reference (BASELINE.md:
"published": {}); we normalize against 1.0 GFlops — the order-of-magnitude
center of the JPDC15 GTX-Titan-era results — so vs_baseline == value.
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    import numpy as np

    from benchmark_spgemm_using_csr_tpu import (
        CSR,
        make_chunked_plan,
        spgemm_chunked,
        spgemm_flops,
    )
    from benchmark_spgemm_using_csr_tpu.utils import generators
    from benchmark_spgemm_using_csr_tpu.utils.timing import bench
    from benchmark_spgemm_using_csr_tpu.utils.results import write_result

    suite = {
        "er_medium": generators.SUITE["er_medium"],
        "powerlaw_medium": generators.SUITE["powerlaw_medium"],
        "poisson2d_256": generators.SUITE["poisson2d_256"],
        "banded_16k": generators.SUITE["banded_16k"],
    }

    from benchmark_spgemm_using_csr_tpu import BSR
    from benchmark_spgemm_using_csr_tpu.ops.bsr import (
        bsr_spgemm,
        bsr_viable,
        make_bsr_plan,
    )

    per_matrix = {}
    for name, factory in suite.items():
        a_sp = factory()
        a = CSR.from_scipy(a_sp)
        flops = spgemm_flops(a, a)
        # method dispatch mirrors the facade's auto rule; CSR->BSR format
        # conversion is data loading (initData analogue), outside the timed
        # loop — the timed call always runs all four algorithmic stages.
        use_bsr = bsr_viable(a)
        if use_bsr:
            a_b = BSR.from_scipy(a_sp, block_shape=(8, 128))
            b_b = BSR.from_scipy(a_sp, block_shape=(128, 128))
            bplan = make_bsr_plan(a_b, b_b)
            run = lambda: bsr_spgemm(a_b, b_b, bplan)
            csp = run().to_scipy().tocsr()
            csp.eliminate_zeros()  # in-block zeros are not true C entries
            nnz_c = int(csp.nnz)
        else:
            plan = make_chunked_plan(a, a)
            run = lambda: spgemm_chunked(a, a, plan)
            nnz_c = int(np.asarray(run().rowptr)[-1])
        res = bench(run, name=name, warmup=2, runs=5, flops=flops)
        per_matrix[name] = {
            "gflops": res.gflops,
            "mean_s": res.mean_s,
            "nnz_per_s": nnz_c / res.mean_s,
            "flops": flops,
            "nnz_c": nnz_c,
        }
        write_result(
            "results.jsonl",
            {"matrix": name, "config": "C=A*A 1chip binned", **per_matrix[name]},
        )

    gmean = float(np.exp(np.mean([np.log(v["gflops"]) for v in per_matrix.values()])))
    print(
        json.dumps(
            {
                "metric": "spgemm_gflops_gmean_1chip",
                "value": round(gmean, 4),
                "unit": "GFlops",
                "vs_baseline": round(gmean / 1.0, 4),
                "detail": {k: round(v["gflops"], 4) for k, v in per_matrix.items()},
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
