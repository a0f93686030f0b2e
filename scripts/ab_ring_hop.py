"""A/B: ring-schedule hop coarsening (VERDICT r4 #5 — ring parity 3.75x,
decomposed to padding 1.10x + per-step schedule serialization 3.42x).

Sweeps RingStatics.hop in {1, 2, 4} on the skewed powerlaw case at N=8
(virtual CPU mesh): hop H keeps H consecutive B blocks resident and runs
P/H super-hops, cutting the per-step schedule overhead ~H x at H x
resident-B memory. Reports total exec time, per-shard parity vs the
single-chip tuned plan on the biggest shard, and correctness vs scipy.

Usage: python scripts/ab_ring_hop.py   (forces the CPU mesh itself)
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh

from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan, spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.parallel import dist
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    P = 8
    a_sp = generators.power_law(4096, 4096, alpha=1.8, max_deg=1024, seed=5)
    a = CSR.from_scipy(a_sp)
    devs = jax.devices()[:P]
    mesh = Mesh(np.array(devs), ("rows",))
    bnds = dist.balanced_row_bounds(a, a, P)
    a_sh = dist.shard_rows(a, P, bounds=bnds)
    b_sh = dist.shard_rows(a, P)

    want = (a_sp @ a_sp).tocsr()
    want.sort_indices()
    want.eliminate_zeros()

    # single-chip tuned plan on the biggest shard (parity denominator)
    widths = np.diff(bnds)
    i_big = int(np.argmax(widths))
    lo, hi = int(bnds[i_big]), int(bnds[i_big + 1])
    sub = CSR.from_scipy(sp.csr_matrix(a_sp.tocsr()[lo:hi]))
    lp1 = make_chunked_plan(sub, a)
    run1 = jax.jit(lambda s_, a_: spgemm_chunked(s_, a_, lp1))
    t_local = timeit(lambda: run1(sub, a))
    print(f"tuned single-shard: {t_local*1e3:.2f} ms", flush=True)

    for hop in (1, 2, 4):
        rplan = dist.make_ring_plan(a, a, P, bounds=bnds, hop=hop)
        run = lambda: dist.dist_spgemm_ring(
            a_sh, b_sh, a.rowptr, mesh, axis="rows", ring_plan=rplan
        )
        got = dist.unshard(run()).to_scipy().tocsr()
        got.sort_indices()
        got.eliminate_zeros()
        assert got.nnz == want.nnz, (hop, got.nnz, want.nnz)
        np.testing.assert_allclose(
            got.data, want.data, rtol=1e-3, atol=1e-3
        )
        t = timeit(run)
        parity = (t / P) / t_local
        print(f"hop={hop}: total {t*1e3:8.2f} ms  per-shard "
              f"{t/P*1e3:6.2f} ms  parity {parity:.2f}x", flush=True)
        write_result(
            "results.jsonl",
            {"config": "scaling/ring-hop", "case": "powerlaw4k-skew",
             "hop": hop, "n_dev": P, "mean_s": t,
             "parity_x": parity, "single_shard_s": t_local,
             "backend": devs[0].platform,
             "caveat": "virtual CPU mesh shares one machine"},
        )


if __name__ == "__main__":
    main()
