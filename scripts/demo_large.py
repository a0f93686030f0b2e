"""Large-scale demo: C = A @ A on a >=100M-nnz scale-free matrix
(BASELINE.json config #5's problem size) on one chip via the row-batched
out-of-core path (ops/batched.py). Multi-host distribution of this size
needs a real pod — the halo/ring schedules are validated on the virtual
mesh (tests/test_halo.py, scripts/bench_scaling.py); this demonstrates the
memory-bounded single-chip execution path at scale.

    python -u scripts/demo_large.py [--nnz 100e6] [--budget 32e6]
"""
import argparse
import os
import sys
import time
import logging
logging.basicConfig(level=logging.INFO)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=float, default=100e6)
    ap.add_argument("--budget", type=float, default=32e6,
                    help="product-stream budget per row block")
    ap.add_argument("--check-sample", type=int, default=512,
                    help="verify this many random rows against scipy")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from benchmark_spgemm_using_csr_tpu import CSR, spgemm_flops
    from benchmark_spgemm_using_csr_tpu.ops.batched import spgemm_batched
    from benchmark_spgemm_using_csr_tpu.utils import generators
    from benchmark_spgemm_using_csr_tpu.utils.results import write_result

    # scale-free with bounded hubs so F stays within a few products/byte
    target = int(args.nnz)
    m = 1 << 22  # 4.2M rows
    mean_deg = target / m
    print(f"generating scale-free matrix: m={m}, target nnz~{target:,}")
    t0 = time.time()
    a_sp = generators.power_law(
        m, m, alpha=2.3, min_deg=max(int(mean_deg * 0.5), 1),
        max_deg=4096, seed=7,
    )
    print(f"  generated nnz={a_sp.nnz:,} in {time.time()-t0:.0f}s")

    a = CSR.from_scipy(a_sp)
    flops = spgemm_flops(a, a)
    print(f"  intermediate products F={flops//2:,} (flops={flops:,})")

    t0 = time.time()
    c_sp = spgemm_batched(a, a, stream_budget=int(args.budget), as_scipy=True)
    elapsed = time.time() - t0
    nnz_c = int(c_sp.nnz)
    gflops = flops / elapsed / 1e9
    print(f"C = A@A: nnzC={nnz_c:,}  {elapsed:.1f}s  {gflops:.3f} GFlops "
          f"(wall, incl. host block orchestration)")

    # sampled verification (full scipy golden at this size is ~minutes)
    rng = np.random.default_rng(0)
    rows = np.sort(rng.choice(m, size=args.check_sample, replace=False))
    want = (a_sp[rows] @ a_sp).tocsr()
    got = c_sp[rows]
    diff = abs(got - want)
    ok = diff.max() <= 1e-2 if diff.nnz else True
    print(f"sampled verify ({args.check_sample} rows): "
          f"{'PASS' if ok else 'FAIL'} (max diff {diff.max() if diff.nnz else 0.0:.2e})")

    write_result(
        "results.jsonl",
        {"config": "large-scale-free-batched-1chip", "nnz_a": int(a_sp.nnz),
         "flops": int(flops), "nnz_c": nnz_c, "wall_s": elapsed,
         "gflops": gflops, "verified_sampled": bool(ok)},
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
