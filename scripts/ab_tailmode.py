"""On-chip A/B: grouped tail_mode shift vs scan, and the widened al sweep.

For each matrix: build grouped schedules under (al=auto, tail=shift),
(al=auto, tail=scan) — plus forced-al variants with --al — and K-scan
delta-time the full pipeline. Decides the production defaults.

    python scripts/ab_tailmode.py [matrix ...] [--scan-block N]
"""
from __future__ import annotations

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
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)

K1 = 4


def time_sched(a, sched, name):
    def kfac(k=K1):
        @jax.jit
        def run(a_c):
            def body(a_i, _):
                c = G.spgemm_grouped(a_i, a_i, sched)
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
    r = bench_delta_stats(kfac, vary, k1=K1, name=name, runs=2)
    return r


def main():
    names = [x for x in sys.argv[1:] if not x.startswith("--")] or [
        "scircuit_256k", "webbase_1m", "econ_206k", "circuit_64k",
    ]
    for name in names:
        a_sp = generators.SUITE[name]()
        a = CSR.from_scipy(a_sp)
        want_nnz = None
        for tail in ("shift", "scan"):
            sched = G.make_grouped_plan(a, a, tail_mode=tail)
            if sched is None:
                print(f"{name}: no grouped plan", flush=True)
                break
            p = sched.plan
            # correctness spot check (first variant only defines golden)
            c = jax.block_until_ready(G.spgemm_grouped(a, a, sched))
            nnz = int(np.asarray(c.rowptr)[-1])
            if want_nnz is None:
                want_nnz = nnz
            assert nnz == want_nnz == p.nnz_c, (nnz, want_nnz, p.nnz_c)
            r = time_sched(a, sched, f"{name}:{tail}")
            print(
                f"{name}: tail={tail} al={p.al} cs={p.cs} g={p.g_cap} "
                f"prod_cap={p.prod_cap/1e6:.1f}M -> {r.per_s*1e3:8.2f} ms "
                f"(spread {r.spread:.1%}, k2={r.k2})",
                flush=True,
            )


if __name__ == "__main__":
    main()
