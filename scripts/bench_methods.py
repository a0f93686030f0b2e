"""Compare all SpGEMM numeric paths on the real TPU.

Times the *hot call only* (plan building excluded — plans are per-profile
static config, like the reference's common.h constants). Run:
    python -u scripts/bench_methods.py [suite names...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from benchmark_spgemm_using_csr_tpu import CSR, pad_bucket, spgemm_flops
from benchmark_spgemm_using_csr_tpu.ops.esc import spgemm_esc_padded
from benchmark_spgemm_using_csr_tpu.ops.fused import make_plan, spgemm_fused
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan,
    spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    names = sys.argv[1:] or ["er_small", "er_medium", "powerlaw_small", "poisson2d_256"]
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        flops = spgemm_flops(a, a)
        cap = pad_bucket(flops // 2)
        golden = spgemm_reference(a, a)
        print(f"\n=== {name}: m={a.m} nnzA={int(np.asarray(a.rowptr)[-1])} F={flops//2} ===")

        candidates = {}
        cplan = make_chunked_plan(a, a)
        candidates[f"chunked(k={cplan.k})"] = lambda: spgemm_chunked(a, a, cplan)
        fplan = make_plan(a, a)
        candidates["fused-binned"] = lambda: spgemm_fused(a, a, fplan)
        if flops // 2 <= (1 << 22):
            candidates["esc"] = lambda: spgemm_esc_padded(a, a, cap, cap)

        for label, fn in candidates.items():
            try:
                c = fn()
                assert_csr_equal(c, golden, rtol=1e-3, atol=1e-4)
                ok = "OK  "
            except AssertionError:
                ok = "FAIL"
            except Exception as e:
                print(f"{label:16s}: ERROR {type(e).__name__}: {e}")
                continue
            t = timeit(fn)
            print(f"{label:16s}: {t*1e3:9.2f} ms -> {flops/t/1e9:7.3f} GFlops  [{ok}]")


if __name__ == "__main__":
    main()
