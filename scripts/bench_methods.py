"""Compare all SpGEMM numeric paths on the real TPU.

Times the *hot call only* (plan building excluded — plans are per-profile
static config, like the reference's common.h constants). Pass --device for
K-scan-amortized device time (amortizes the ~26 ms axon dispatch floor, same
methodology as bench.py; slower to compile). Run:
    python -u scripts/bench_methods.py [--device] [suite names...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR, pad_bucket, spgemm_flops
from benchmark_spgemm_using_csr_tpu.ops.esc import spgemm_esc_padded
from benchmark_spgemm_using_csr_tpu.ops.fused import make_plan, spgemm_fused
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan,
    spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.ops.tiled import make_tiled_plan, spgemm_tiled
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)

K_ITERS = 4


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def k_amortized(spgemm_of_a, a, n=3, warmup=1):
    """Device time per pipeline via a K-iteration in-graph scan (bench.py
    methodology: a runtime-zero nudge chains iterations so XLA can't CSE).
    Each outer run gets distinct value bits — the axon tunnel
    short-circuits bitwise-identical re-dispatches without executing
    (utils/timing.py docstring)."""

    from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

    @jax.jit
    def run(a_c):
        def body(a_i, _):
            c = spgemm_of_a(a_i)
            # probe EVERY output: rowptr[-1] alone lets XLA drop the
            # compaction sort + run-sum (utils/timing.runtime_zero_probe)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(
                a_i.vals.dtype
            )
            return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape), c.rowptr[-1]

        _, outs = jax.lax.scan(body, a_c, None, length=K_ITERS)
        return outs

    def nudged(i):
        out = CSR(a.rowptr, a.colidx,
                  a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
        return jax.block_until_ready(out)

    idx = 0
    for _ in range(warmup):
        jax.block_until_ready(run(nudged(idx)))
        idx += 1
    ts = []
    for _ in range(n):
        arg = nudged(idx)
        idx += 1
        t0 = time.perf_counter()
        jax.block_until_ready(run(arg))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K_ITERS


def main():
    args = sys.argv[1:]
    device_mode = "--device" in args
    names = [a_ for a_ in args if not a_.startswith("--")] or [
        "er_small", "er_medium", "powerlaw_small", "poisson2d_256"
    ]
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        flops = spgemm_flops(a, a)
        cap = pad_bucket(flops // 2)
        golden = spgemm_reference(a, a)
        print(f"\n=== {name}: m={a.m} nnzA={int(np.asarray(a.rowptr)[-1])} F={flops//2} ===")

        candidates = {}
        cplan = make_chunked_plan(a, a)
        candidates[f"chunked(k={cplan.k})"] = (
            lambda a_c, cplan=cplan: spgemm_chunked(a_c, a_c, cplan)
        )
        tplan = make_tiled_plan(a, a)
        if tplan is not None:
            candidates[f"tiled(W={tplan.width})"] = (
                lambda a_c, tplan=tplan: spgemm_tiled(a_c, a_c, tplan)
            )
        fplan = make_plan(a, a)
        candidates["fused-binned"] = (
            lambda a_c, fplan=fplan: spgemm_fused(a_c, a_c, fplan)
        )
        if flops // 2 <= (1 << 22) and not device_mode:
            candidates["esc"] = (
                lambda a_c: spgemm_esc_padded(a_c, a_c, cap, cap)
            )

        for label, fn in candidates.items():
            try:
                c = fn(a)
                assert_csr_equal(c, golden, rtol=1e-3, atol=1e-4)
                ok = "OK  "
            except AssertionError:
                ok = "FAIL"
            except Exception as e:
                print(f"{label:16s}: ERROR {type(e).__name__}: {e}")
                continue
            if device_mode:
                t = k_amortized(fn, a)
                tag = "device"
            else:
                t = timeit(lambda: fn(a))
                tag = "wall"
            print(f"{label:16s}: {t*1e3:9.2f} ms {tag} -> "
                  f"{flops/t/1e9:7.3f} GFlops  [{ok}]")


if __name__ == "__main__":
    main()
