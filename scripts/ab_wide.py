"""Interleaved same-process A/B of the wide-row path (drift-proof):
alternates wide-on / wide-off K-scans so tunnel load variation cancels.
    python scripts/ab_wide.py [matrix ...]
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
    names = sys.argv[1:] or ["powerlaw_medium", "circuit_64k"]
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        p_on = make_chunked_plan(a, a)
        p_off = make_chunked_plan(a, a, wide_min=0)
        if not p_on.wide_min:
            print(f"{name}: wide not auto-enabled, skipping")
            continue
        runs = {"wide-on": k_scan(p_on), "wide-off": k_scan(p_off)}

        def nudged(i):
            out = CSR(a.rowptr, a.colidx,
                      a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
            return jax.block_until_ready(out)

        # warm both
        idx = 0
        for fn in runs.values():
            jax.block_until_ready(fn(nudged(idx)))
            idx += 1
        times = {k: [] for k in runs}
        for rep in range(4):  # interleaved
            for label, fn in runs.items():
                arg = nudged(idx)
                idx += 1
                t0 = time.perf_counter()
                jax.block_until_ready(fn(arg))
                times[label].append((time.perf_counter() - t0) / K)
        print(f"\n=== {name} (k={p_on.k} wide_min={p_on.wide_min} "
              f"wchunks={p_on.wchunks_cap} | off: k={p_off.k}) ===")
        for label, ts in times.items():
            print(f"{label:9s}: min {min(ts)*1e3:8.2f} ms  "
                  f"all {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
