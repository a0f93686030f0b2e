"""Interleaved A/B: small-lane aligned fetch (L=16/32) for mid-length rows
vs the narrow per-product gather, on er-like profiles.
    python scripts/ab_midwide.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan, spgemm_chunked
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)
from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

K = 4


def k_scan(plan):
    @jax.jit
    def run(a_c):
        def body(a_i, _):
            c = spgemm_chunked(a_i, a_i, plan)
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
    name = sys.argv[1] if len(sys.argv) > 1 else "er_medium"
    a = CSR.from_scipy(generators.SUITE[name]())
    golden = spgemm_reference(a, a)
    print("backend:", jax.devices())
    plans = {
        "narrow": make_chunked_plan(a, a, wide_min=0),
        "L16/min12": make_chunked_plan(a, a, wide_min=12, wide_lanes=16),
        "L32/min20": make_chunked_plan(a, a, wide_min=20, wide_lanes=32),
    }
    runs = {}
    for label, plan in plans.items():
        c = spgemm_chunked(a, a, plan)
        try:
            assert_csr_equal(c, golden, rtol=1e-3, atol=1e-3)
            ok = True
        except AssertionError:
            ok = False
        print(f"{label}: k={plan.k} cap={plan.prod_cap} "
              f"wchunks={plan.wchunks_cap} correct={ok}")
        runs[label] = k_scan(plan)

    def nudged(i):
        out = CSR(a.rowptr, a.colidx,
                  a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
        return jax.block_until_ready(out)

    idx = 0
    for fn in runs.values():
        jax.block_until_ready(fn(nudged(idx)))
        idx += 1
    times = {k_: [] for k_ in runs}
    for rep in range(4):
        for label, fn in runs.items():
            arg = nudged(idx)
            idx += 1
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            times[label].append((time.perf_counter() - t0) / K)
    print(f"\n=== {name} ===")
    for label, ts in times.items():
        print(f"{label:10s}: min {min(ts)*1e3:8.2f} ms  "
              f"all {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
