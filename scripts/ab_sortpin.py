"""A/B the grouped 2D sort's fusion-excess escape hatches (VERDICT r4 #2).

Context: the in-pipeline sort stage delta reads ~1.7x the identical
materialized-operand micro (68.2 vs 39.8 ms at scircuit's (352, 131072)).
Round 4 ruled out producer re-fusion via a pass-through lax.scan pin
(no-op) and parked the direct optimization_barrier pin (HANGS the axon
remote compile — CLAUDE.md hazard; NOT re-attempted here). This script
measures the remaining cheap hatches end-to-end on the full grouped
pipeline (total K-scan time — stage attribution is exactly what's in
question, so only totals are trusted):

- none:     production (baseline)
- bitcast:  u32->i32->u32 / f32->i32->f32 round-trip on the sort operands
- cond:     identity lax.cond wrapping the operands (runtime-true branch)

Run on the real chip: python scripts/ab_sortpin.py [matrix] [k1]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.ops import grouped as G
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "scircuit_256k"
    k1 = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    sched = G.make_grouped_plan(a, a)
    assert sched is not None

    # golden once (production mode)
    want = (a_sp @ a_sp).tocsr()
    want.sort_indices()

    results = {}
    for mode in (None, "bitcast", "cond"):
        G._SORT_PIN[0] = mode
        try:
            got = G.spgemm_grouped(a, a, sched).to_scipy().tocsr()
            got.sort_indices()
            assert got.nnz == want.nnz, (mode, got.nnz, want.nnz)
            np.testing.assert_allclose(
                got.data, want.data, rtol=1e-3, atol=1e-4
            )

            def kfac(k, sched=sched):
                @jax.jit
                def run(a_c):
                    def body(a_i, _):
                        c = G.spgemm_grouped(a_i, a_i, sched)
                        eps = runtime_zero_probe(
                            c.rowptr, c.colidx, c.vals
                        ).astype(a_c.vals.dtype)
                        return CSR(
                            a_i.rowptr, a_i.colidx, a_i.vals + eps,
                            a_i.shape
                        ), c.rowptr[-1]
                    _, outs = jax.lax.scan(body, a_c, None, length=k)
                    return outs
                return run

            dres = bench_delta_stats(
                kfac,
                lambda i: (CSR(a.rowptr, a.colidx,
                               a.vals + jnp.float32(1e-6 * i), a.shape),),
                k1=k1, name=f"sortpin_{mode}", runs=3,
            )
            results[str(mode)] = dres.per_s
            print(f"pin={mode}: {dres.per_s*1e3:.2f} ms"
                  f" (spread {dres.spread:.1%})", flush=True)
        finally:
            G._SORT_PIN[0] = None
    write_result(
        "results.jsonl",
        {"matrix": name, "config": "ab_sortpin grouped-total",
         **{f"ms_{k}": round(v * 1e3, 2) for k, v in results.items()}},
    )
    base = results.get("None")
    for k, v in results.items():
        if k != "None" and base:
            print(f"{k}: {v / base:.3f}x of production")


if __name__ == "__main__":
    main()
