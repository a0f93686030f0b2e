"""BSR (MXU) vs chunked on the bench suite — decides the auto-dispatch."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from benchmark_spgemm_using_csr_tpu import (
    CSR, BSR, make_chunked_plan, spgemm_chunked, spgemm_flops,
)
from benchmark_spgemm_using_csr_tpu.ops.bsr import (
    block_density, bsr_spgemm, make_bsr_plan,
)
from benchmark_spgemm_using_csr_tpu.utils import generators


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
    print("backend:", jax.devices())
    for name in (sys.argv[1:] or ["banded_16k", "poisson2d_256", "er_medium", "powerlaw_medium"]):
        a_sp = generators.SUITE[name]()
        a = CSR.from_scipy(a_sp)
        flops = spgemm_flops(a, a)
        print(f"\n=== {name}: m={a.m} nnzA={a_sp.nnz} F={flops//2} ===")

        plan = make_chunked_plan(a, a)
        t = timeit(lambda: spgemm_chunked(a, a, plan))
        print(f"chunked        : {t*1e3:9.2f} ms -> {flops/t/1e9:7.3f} GFlops")

        for bs in [(8, 128), (8, 256)]:
            bm, bk = bs
            try:
                dens = block_density(a, (bm, bk))
                a_b = BSR.from_scipy(a_sp, block_shape=(bm, bk))
                b_b = BSR.from_scipy(a_sp, block_shape=(bk, bk))
                bplan = make_bsr_plan(a_b, b_b)
                blk_bytes = bplan.pairs_cap * bm * bk * 4
                if blk_bytes > 6 * (1 << 30):
                    print(f"bsr {bs}: skipped ({blk_bytes>>30} GiB product blocks)")
                    continue
                from benchmark_spgemm_using_csr_tpu.ops.bsr import bsr_spgemm as run

                t = timeit(lambda: run(a_b, b_b, bplan))
                print(
                    f"bsr {str(bs):10s}: {t*1e3:9.2f} ms -> {flops/t/1e9:7.3f} GFlops"
                    f"  (density {dens*100:.2f}%, pairs {bplan.pairs_cap})"
                )
            except Exception as e:
                print(f"bsr {bs}: ERROR {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
