"""N-device scaling harness (BASELINE.json: ">=70% scaling efficiency").

Times ONLY the jitted shard_map executable on pre-sharded, device-resident
inputs — host planning/sharding is initData-analogue setup. On this machine
only a *virtual CPU mesh* exists (one physical TPU chip via axon): the N
virtual devices share one CPU, so absolute scaling here validates the
schedules' work division and collective wiring, NOT hardware scaling — on a
real pod each mesh slot is its own chip and the same code path applies.

    python -u scripts/bench_scaling.py
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

from benchmark_spgemm_using_csr_tpu import CSR, pad_bucket, spgemm_flops
from benchmark_spgemm_using_csr_tpu.parallel import dist
from benchmark_spgemm_using_csr_tpu.parallel.halo import (
    build_halo_plan,
    dist_spgemm_halo,
)
from benchmark_spgemm_using_csr_tpu.ops.symbolic import nnz_upper_bound
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def shard_bounds(a, n_shards):
    nnz_ct = np.asarray(jax.jit(nnz_upper_bound)(a, a))
    rowptr = np.asarray(a.rowptr)
    m_loc = -(-a.m // n_shards)
    bounds = []
    for i in range(n_shards):
        lo, hi = i * m_loc, min((i + 1) * m_loc, a.m)
        bounds.append(int(nnz_ct[lo:hi].sum()))
    return pad_bucket(max(bounds + [1]))


def main():
    devs = jax.devices()
    sizes = [s for s in [1, 2, 4, 8] if s <= len(devs)]
    print(f"devices: {len(devs)} x {devs[0].platform}")
    print("NOTE: virtual CPU mesh — slots share one machine; numbers validate")
    print("the schedules, not hardware scaling (single physical TPU chip).")

    cases = {
        "er4k": generators.erdos_renyi(4096, 4096, 8.0, seed=3),
        # skewed: the case where product-balanced bounds actually move
        # the unified statics (VERDICT r3 next #4)
        "powerlaw4k": generators.power_law(
            4096, 4096, alpha=2.0, max_deg=512, seed=3
        ),
    }
    import scipy.sparse as sp

    from benchmark_spgemm_using_csr_tpu.ops.chunked import (
        make_chunked_plan, spgemm_chunked,
    )

    for cname, a_sp_in in cases.items():
        a = CSR.from_scipy(a_sp_in)
        flops = spgemm_flops(a, a)
        for schedule in ("replicated", "ring", "halo"):
            for part in ("uniform", "balanced"):
                bounds = (
                    None if part == "uniform"
                    else dist.balanced_row_bounds(a, a, sizes[-1])
                )
                tag = f"{cname}/{schedule}/{part}"
                print(f"\n--- {tag}: exec-only timing ---")
                t1 = None
                # balanced variant: N=8 parity focus only (each (N, plan)
                # pair is a fresh shard_map compile on the one host core)
                for n in (sizes if part == "uniform" else sizes[-1:]):
                    bnds = (
                        None if part == "uniform"
                        else dist.balanced_row_bounds(a, a, n)
                    )
                    mesh = Mesh(np.array(devs[:n]), ("rows",))
                    if schedule == "replicated":
                        a_sh = dist.shard_rows(a, n, bounds=bnds)
                        lp = dist.make_dist_local_plan(
                            a, a, n, bounds=bnds
                        )
                        run = lambda: dist.dist_spgemm_replicated(
                            a_sh, a, mesh, plan=lp
                        )
                    elif schedule == "ring":
                        a_sh = dist.shard_rows(a, n, bounds=bnds)
                        b_sh = dist.shard_rows(a, n)
                        rplan = dist.make_ring_plan(a, a, n, bounds=bnds)
                        run = lambda: dist.dist_spgemm_ring(
                            a_sh, b_sh, a.rowptr, mesh, axis="rows",
                            ring_plan=rplan,
                        )
                    else:
                        plan = build_halo_plan(a, a, n, bounds=bnds)
                        b_sh = dist.shard_rows(a, n)
                        run = lambda: dist_spgemm_halo(plan, b_sh, mesh)
                    # correctness once per config (at N=last)
                    if n == sizes[-1]:
                        got = dist.unshard(run()).to_scipy().tocsr()
                        want = (a.to_scipy() @ a.to_scipy()).tocsr()
                        got.sort_indices(); want.sort_indices()
                        got.eliminate_zeros(); want.eliminate_zeros()
                        assert got.nnz == want.nnz, (tag, got.nnz, want.nnz)
                        np.testing.assert_allclose(
                            got.data, want.data, rtol=1e-3, atol=1e-3
                        )
                    t = timeit(run)
                    t1 = t1 or t
                    eff = t1 / (n * t)
                    print(f"  N={n}: {t*1e3:9.2f} ms  {flops/t/1e9:7.3f} GF"
                          f"  strong-eff {eff*100:5.1f}% (shared-CPU mesh)")
                    write_result(
                        "results.jsonl",
                        {"config": f"scaling/{schedule}",
                         "case": cname, "partition": part,
                         "mode": "strong-execonly",
                         "n_dev": n, "mean_s": t,
                         "gflops": flops / t / 1e9,
                         "efficiency": eff, "backend": devs[0].platform,
                         "caveat": "virtual CPU mesh shares one machine"},
                    )
                    t_last = t

                # --- per-shard parity + decomposition (VERDICT r3 #4):
                # t(N)/N vs (a) single-chip tuned plan on a shard-sized
                # problem, and (b) the SAME unified dist plan run as a
                # plain single-device jit — (b)-(a) isolates the
                # unified-statics padding cost, t(N)/N - (b) isolates
                # shard_map/collective overhead on the shared core.
                n = sizes[-1]
                bnds = bounds
                if bnds is None:
                    m_loc = -(-a.m // n)
                    lo, hi = 0, m_loc
                else:
                    widths = np.diff(bnds)
                    i_big = int(np.argmax(widths))
                    lo, hi = int(bnds[i_big]), int(bnds[i_big + 1])
                a_sp = a.to_scipy().tocsr()
                sub = CSR.from_scipy(sp.csr_matrix(a_sp[lo:hi]))
                lp1 = make_chunked_plan(sub, a)
                run1 = jax.jit(lambda s_, a_: spgemm_chunked(s_, a_, lp1))
                t_local = timeit(lambda: run1(sub, a))
                lp_u = dist.make_dist_local_plan(a, a, n, bounds=bnds)
                run_u = jax.jit(lambda s_, a_: spgemm_chunked(s_, a_, lp_u))
                t_unified = timeit(lambda: run_u(sub, a))
                parity = (t_last / n) / t_local
                print(f"  parity N={n}: dist {t_last/n*1e3:.2f} ms/shard | "
                      f"tuned-1shard {t_local*1e3:.2f} | "
                      f"unified-plan-1shard {t_unified*1e3:.2f} -> "
                      f"{parity:.2f}x (padding {t_unified/t_local:.2f}x, "
                      f"shard_map {(t_last/n)/t_unified:.2f}x)")
                write_result(
                    "results.jsonl",
                    {"config": f"scaling/{schedule}",
                     "case": cname, "partition": part,
                     "mode": "per-shard-parity",
                     "n_dev": n, "dist_per_shard_s": t_last / n,
                     "single_shard_s": t_local,
                     "unified_plan_shard_s": t_unified,
                     "parity_x": parity,
                     "padding_x": t_unified / t_local,
                     "shardmap_x": (t_last / n) / t_unified,
                     "backend": devs[0].platform,
                     "caveat": "virtual CPU mesh shares one machine"},
                )


if __name__ == "__main__":
    main()
