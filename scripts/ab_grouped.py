"""On-chip A/B: grouped-ESC (ops/grouped.py) vs the chunked pipeline.

K-scan in-graph timing with varied inputs (tunnel caching trap) and
runtime_zero_probe on every output (DCE trap). Run:
    python scripts/ab_grouped.py [matrix ...] [--al 0|8] [--slots N]
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

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan, spgemm_chunked
from benchmark_spgemm_using_csr_tpu.ops.grouped import (
    make_grouped_plan,
    spgemm_grouped,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta,
    runtime_zero_probe,
)

K = 8


def k_loop(fn):
    def mk(k=K):
        @jax.jit
        def run(a):
            def body(a_c, _):
                c = fn(a_c)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_c.vals.dtype)
                return CSR(a_c.rowptr, a_c.colidx, a_c.vals + eps,
                           a_c.shape), c.rowptr[-1]
            _, outs = jax.lax.scan(body, a, None, length=k)
            return outs
        return run
    return mk


def main() -> None:
    args = [x for x in sys.argv[1:] if not x.startswith("--")]
    al = None
    slots = None
    if "--al" in sys.argv:
        al = int(sys.argv[sys.argv.index("--al") + 1])
    if "--slots" in sys.argv:
        slots = int(sys.argv[sys.argv.index("--slots") + 1])
    names = args or ["powerlaw_medium", "webbase_1m"]
    print("backend:", jax.devices())
    for name in names:
        a_sp = generators.SUITE[name]()
        a = CSR.from_scipy(a_sp)
        flops = 0
        vary = lambda i: (CSR(
            a.rowptr, a.colidx,
            a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape),)

        plan = make_chunked_plan(a, a)
        t_c, k2c = bench_delta(
            k_loop(lambda x: spgemm_chunked(x, x, plan)), vary,
            k1=K, name=f"{name}_chunked", flops=flops)
        print(f"{name}: chunked   {t_c*1e3:9.2f} ms  (k2={k2c}) "
              f"k={plan.k} al={plan.al} wide={plan.wide_min} "
              f"u32={plan.pack_u32}", flush=True)

        for al_try in ([al] if al is not None else [0, 8]):
            sched = make_grouped_plan(a, a, al=al_try, target_slots=slots)
            if sched is None:
                print(f"{name}: grouped al={al_try} -> no plan", flush=True)
                continue
            p = sched.plan
            # correctness spot check on-chip (structure + total)
            c = spgemm_grouped(a, a, sched)
            nnz_rt = int(np.asarray(c.rowptr)[-1])
            assert nnz_rt == p.nnz_c, (nnz_rt, p.nnz_c)
            t_g, k2g = bench_delta(
                k_loop(lambda x, s=sched: spgemm_grouped(x, x, s)), vary,
                k1=K, name=f"{name}_grouped{al_try}", flops=flops)
            print(
                f"{name}: grouped{al_try}  {t_g*1e3:9.2f} ms  (k2={k2g}) "
                f"cs={p.cs} g={p.g_cap} lanes={p.lanes} "
                f"prod_cap={p.prod_cap} lbits={p.lbits} cbits={p.cbits} "
                f"-> {'WIN' if t_g < t_c else 'lose'} {t_c/t_g:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
