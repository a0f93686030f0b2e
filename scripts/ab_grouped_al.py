"""On-chip A/B: grouped expansion mode (narrow k=1 vs forced al=2/4) for
tiny-row matrices — is the al<8 table-build guard leaving wins on the table?

Motivation: webbase_1m (mean B row 4.4) rides al=0 at 268 ms, and its
roofline is DESCRIPTOR-bound: ~21M expansion descriptors (one per product
slot) + ~15M metadata descriptors. al=2 would halve expansion descriptors
for ~1.15x slot inflation, but the round-3 sweep guard (nrows_tbl <= 512k
for al < 8 — an al=2 table once OOMed at 11.5M rows when XLA failed to
fuse the (nrows, al, 1+vw) build gather into the consumer) excludes it
UNMEASURED at webbase's 2.8M table rows. This script forces each mode and
measures; if a guarded mode wins and doesn't OOM, the guard moves.

Honest K-scan methodology (utils/timing.bench_delta_stats, varied inputs).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops.grouped import (
    make_grouped_plan, spgemm_grouped,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats, runtime_zero_probe,
)

RESULTS = "/root/repo/results.jsonl"


def k_loop(sched, k):
    @jax.jit
    def run(a_in):
        def body(a_c, _):
            c = spgemm_grouped(a_c, a_c, sched)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(
                a_c.vals.dtype
            )
            return CSR(a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape), \
                c.rowptr[-1]
        _, outs = jax.lax.scan(body, a_in, None, length=k)
        return outs
    return run


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "webbase_1m"
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    from benchmark_spgemm_using_csr_tpu import spgemm_flops

    flops = spgemm_flops(a, a)
    import jax.numpy as jnp

    def vary(i):
        return (CSR(a.rowptr, a.colidx,
                    a.vals + jnp.asarray(1e-6 * (i + 1), a.vals.dtype),
                    a.shape),)

    rec = {"config": "ab_grouped_al", "matrix": name}
    best = None
    for al in (None, 0, 2, 4, 8):
        sched = make_grouped_plan(a, a, al=al)
        if sched is None:
            print(f"al={al}: no plan")
            continue
        p = sched.plan
        tag = "auto" if al is None else str(al)
        label = (f"al={tag}(-> {p.al}) cs={p.cs} g_cap={p.g_cap} "
                 f"prod_cap={p.prod_cap:,} s_cap={p.s_cap:,}")
        try:
            r = bench_delta_stats(
                lambda k, s=sched: k_loop(s, k), vary, k1=8,
                name=f"{name}_al{tag}")
        except Exception as e:  # OOM / compile failure is a finding too
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
            rec[f"al{tag}_error"] = f"{type(e).__name__}"
            continue
        gf = flops / r.per_s / 1e9
        print(f"{label}: {r.per_s*1e3:8.2f} ms  {gf:6.3f} GF "
              f"spread={r.spread:.3f}", flush=True)
        rec[f"al{tag}_ms"] = round(r.per_s * 1e3, 2)
        if best is None or r.per_s < best[1]:
            best = (tag, r.per_s, p.al)
    if best:
        rec["best"] = best[0]
        rec["best_ms"] = round(best[1] * 1e3, 2)
        write_result(RESULTS, rec)
        print("best:", rec["best"], rec["best_ms"], "ms")


if __name__ == "__main__":
    main()
