"""On-chip A/B: chunked tail_mode shift vs scan (+ forced-al grouped runs).

    python scripts/ab_chunked_tail.py [matrix ...]       # chunked A/B
    python scripts/ab_chunked_tail.py --grouped-al N m   # forced-al grouped
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops import grouped as G
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan,
    spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)

K1 = 4


def time_fn(a, fn, name):
    def kfac(k=K1):
        @jax.jit
        def run(a_c):
            def body(a_i, _):
                c = fn(a_i)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_i.vals.dtype)
                return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps,
                           a_i.shape), c.rowptr[-1]
            _, outs = jax.lax.scan(body, a_c, None, length=k)
            return outs
        return run

    vary = lambda i: (CSR(a.rowptr, a.colidx,
                          a.vals + jnp.asarray(1e-6 * i, a.vals.dtype),
                          a.shape),)
    return bench_delta_stats(kfac, vary, k1=K1, name=name, runs=2)


def main():
    args = [x for x in sys.argv[1:] if not x.startswith("--")]
    if "--grouped-al" in sys.argv:
        al = int(sys.argv[sys.argv.index("--grouped-al") + 1])
        names = args[1:] if args and args[0] == str(al) else args
        for name in names:
            a = CSR.from_scipy(generators.SUITE[name]())
            sched = G.make_grouped_plan(a, a, al=al)
            if sched is None:
                print(f"{name}: no grouped plan at al={al}", flush=True)
                continue
            p = sched.plan
            r = time_fn(a, lambda x: G.spgemm_grouped(x, x, sched),
                        f"{name}:al{al}")
            print(f"{name}: grouped al={al} cs={p.cs} g={p.g_cap} "
                  f"prod_cap={p.prod_cap/1e6:.1f}M -> {r.per_s*1e3:8.2f} ms"
                  f" (spread {r.spread:.1%})", flush=True)
        return

    for name in args or ["powerlaw_medium"]:
        a = CSR.from_scipy(generators.SUITE[name]())
        base = make_chunked_plan(a, a)
        for tail in ("shift", "scan"):
            plan = dataclasses.replace(base, tail_mode=tail)
            r = time_fn(a, lambda x, p=plan: spgemm_chunked(x, x, p),
                        f"{name}:{tail}")
            print(f"{name}: chunked tail={tail} k={plan.k} al={plan.al} "
                  f"u32={plan.pack_u32} -> {r.per_s*1e3:8.2f} ms "
                  f"(spread {r.spread:.1%})", flush=True)


if __name__ == "__main__":
    main()
