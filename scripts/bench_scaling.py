"""N-device scaling-efficiency harness (BASELINE.json: ">=70% scaling
efficiency" at N hosts).

Only one physical TPU chip exists here, so scaling is measured on the forced
CPU mesh — the numbers validate the *harness and schedules* (work division,
collective overlap), not ICI bandwidth. Run on a real pod unchanged.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -u scripts/bench_scaling.py

Reports strong scaling (fixed problem) and weak scaling (fixed work per
device) efficiency for each schedule, appended to results.jsonl.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from benchmark_spgemm_using_csr_tpu import CSR, spgemm_flops
from benchmark_spgemm_using_csr_tpu.parallel.dist import dist_spgemm
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    devs = jax.devices()
    sizes = [1, 2, 4, 8]
    sizes = [s for s in sizes if s <= len(devs)]
    results = {}

    print(f"devices: {len(devs)} x {devs[0].platform}")
    for schedule in ("replicated", "ring", "halo"):
        print(f"\n--- strong scaling, {schedule} (fixed 16k-row ER) ---")
        a = CSR.from_scipy(generators.erdos_renyi(16384, 16384, 8.0, seed=3))
        flops = spgemm_flops(a, a)
        t1 = None
        for n in sizes:
            mesh = Mesh(np.array(devs[:n]), ("rows",))
            t = timeit(lambda: dist_spgemm(a, a, mesh, schedule=schedule))
            t1 = t1 or t
            eff = t1 / (n * t)
            print(f"  N={n}: {t*1e3:9.2f} ms  {flops/t/1e9:7.3f} GFlops  strong-eff {eff*100:5.1f}%")
            write_result(
                "results.jsonl",
                {"config": f"scaling/{schedule}", "mode": "strong", "n_dev": n,
                 "mean_s": t, "gflops": flops / t / 1e9, "efficiency": eff,
                 "backend": devs[0].platform},
            )

        print(f"--- weak scaling, {schedule} (4k rows/device) ---")
        t1 = None
        for n in sizes:
            a = CSR.from_scipy(
                generators.erdos_renyi(4096 * n, 4096 * n, 8.0, seed=3)
            )
            flops = spgemm_flops(a, a)
            mesh = Mesh(np.array(devs[:n]), ("rows",))
            t = timeit(lambda: dist_spgemm(a, a, mesh, schedule=schedule))
            t1 = t1 or t
            eff = t1 / t
            print(f"  N={n}: {t*1e3:9.2f} ms  {flops/t/1e9:7.3f} GFlops  weak-eff {eff*100:5.1f}%")
            write_result(
                "results.jsonl",
                {"config": f"scaling/{schedule}", "mode": "weak", "n_dev": n,
                 "mean_s": t, "gflops": flops / t / 1e9, "efficiency": eff,
                 "backend": devs[0].platform},
            )


if __name__ == "__main__":
    main()
