"""Interleaved same-process A/B: log-shift monotone compaction vs the
compaction sort (merge_products compact= option).
    python scripts/ab_compact.py [matrix ...]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _expand_chunks,
    _expand_wide,
    merge_products,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)
from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

K = 4


def pipeline(a_c, plan, compact):
    m, n = a_c.m, a_c.n
    row, col, val = _expand_chunks(
        a_c, a_c, plan.k, plan.chunks_cap, wide_min=plan.wide_min
    )
    if plan.wide_min:
        rw, cw, vw = _expand_wide(
            a_c, a_c, plan.wide_min, plan.wchunks_cap, plan.bpad_cap
        )
        row = jnp.concatenate([row, rw])
        col = jnp.concatenate([col, cw])
        val = jnp.concatenate([val, vw.astype(val.dtype)])
    return merge_products(
        row, col, val, m, n, plan.out_cap, plan.max_run, a_c.vals.dtype,
        compact=compact,
    )


def k_scan(plan, compact):
    @jax.jit
    def run(a_c):
        def body(a_i, _):
            c = pipeline(a_i, plan, compact)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(
                a_i.vals.dtype
            )
            return (
                CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape),
                c.rowptr[-1],
            )

        _, outs = jax.lax.scan(body, a_c, None, length=K)
        return outs

    return run


def main():
    names = sys.argv[1:] or ["er_medium", "powerlaw_medium", "circuit_64k"]
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        plan = make_chunked_plan(a, a)
        golden = spgemm_reference(a, a)
        c = jax.jit(partial(pipeline, plan=plan, compact="shift"))(a)
        try:
            assert_csr_equal(c, golden, rtol=1e-3, atol=1e-3)
            ok = True
        except AssertionError:
            ok = False
        runs = {
            "shift": k_scan(plan, "shift"),
            "sort": k_scan(plan, "sort"),
        }

        def nudged(i):
            out = CSR(a.rowptr, a.colidx,
                      a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
            return jax.block_until_ready(out)

        idx = 0
        for fn in runs.values():
            jax.block_until_ready(fn(nudged(idx)))
            idx += 1
        times = {k: [] for k in runs}
        for rep in range(4):
            for label, fn in runs.items():
                arg = nudged(idx)
                idx += 1
                t0 = time.perf_counter()
                jax.block_until_ready(fn(arg))
                times[label].append((time.perf_counter() - t0) / K)
        print(f"\n=== {name} (k={plan.k} cap={plan.prod_cap} "
              f"correct={ok}) ===")
        for label, ts in times.items():
            print(f"{label:6s}: min {min(ts)*1e3:8.2f} ms  "
                  f"all {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
