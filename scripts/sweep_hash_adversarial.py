"""Adversarial hash-regime sweep (VERDICT r3 next #9): measure the
dense-accumulator hash path against grouped/chunked on the family it was
built for — extreme duplicate ratios (F >> m*n) with dense/BSR infeasible
shapes — turning dispatch.estimate_hash_s's "no winning TPU regime" claim
into a recorded measurement.

Family: A (m x m) uniform 32 nnz/row, B (m x n) uniform d nnz/row with n
swept so F/(m*n) covers ~4x..64x. dense is infeasible (m*k operand alone
exceeds the 1 GB budget at m=32768); DIA/BSR reject (no structure).

Timing: hash is host-orchestrated (multi-dispatch) -> wall clock over
tiles; grouped/chunked are one-dispatch K-scans (bench_delta_stats).
Results land in results.jsonl as hash_sweep rows.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops import dispatch as D
from benchmark_spgemm_using_csr_tpu.ops.hash import spgemm_hash
from benchmark_spgemm_using_csr_tpu.ops.grouped import (
    make_grouped_plan, spgemm_grouped,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal, spgemm_reference,
)
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats, runtime_zero_probe,
)
from benchmark_spgemm_using_csr_tpu.utils.results import write_result

K = 8
M = 32768

for n, dB in ((2048, 64), (512, 64), (128, 64)):
    a_sp = generators.erdos_renyi(M, M, 32.0, seed=1)
    b_sp = generators.erdos_renyi(M, n, float(dB), seed=2)
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    stats = D._stats(a, b)
    F = stats[-1]
    ratio = F / (M * n)
    est_h = D.estimate_hash_s(a, b)
    est_g = D.estimate_grouped_s(a, b)
    est_d = D.estimate_dense_s(a, b)
    print(f"== n={n}: F={F/1e6:.1f}M dup-ratio F/(m*n)={ratio:.1f} "
          f"est hash {est_h*1e3:.0f}ms grouped {est_g*1e3:.0f}ms "
          f"dense {'inf' if est_d == float('inf') else est_d}", flush=True)

    # hash: wall clock (host-orchestrated), correctness once
    c_h = spgemm_hash(a, b)
    assert_csr_equal(c_h, spgemm_reference(a, b), rtol=1e-3, atol=1e-3)
    walls = []
    for i in range(3):
        a_i = CSR(a.rowptr, a.colidx,
                  a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
        t0 = time.perf_counter()
        jax.block_until_ready(spgemm_hash(a_i, b).vals)
        walls.append(time.perf_counter() - t0)
    t_hash = min(walls[1:])
    print(f"   hash wall {t_hash*1e3:.1f} ms", flush=True)

    # grouped: K-scan device time
    sched = make_grouped_plan(a, b)
    assert sched is not None

    def kfac(k=K, sched=sched, b=b):
        @jax.jit
        def run(a_c):
            def body(a_i, _):
                c = spgemm_grouped(a_i, b, sched)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_i.vals.dtype)
                return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps,
                           a_i.shape), c.rowptr[-1]
            _, outs = jax.lax.scan(body, a_c, None, length=k)
            return outs
        return run

    c_g = spgemm_grouped(a, b, sched)
    assert_csr_equal(c_g, spgemm_reference(a, b), rtol=1e-3, atol=1e-3)
    dres = bench_delta_stats(
        kfac,
        lambda i: (CSR(a.rowptr, a.colidx,
                       a.vals + jnp.asarray(1e-6 * i, a.vals.dtype),
                       a.shape),),
        k1=K, name=f"hashsweep_n{n}", flops=2 * F,
    )
    t_grp = dres.per_s
    print(f"   grouped device {t_grp*1e3:.1f} ms -> hash/grouped "
          f"{t_hash/t_grp:.1f}x", flush=True)
    write_result(
        "results.jsonl",
        {"config": "hash_sweep", "n": n, "products": int(F),
         "dup_ratio": round(ratio, 2), "hash_wall_s": t_hash,
         "grouped_device_s": t_grp,
         "hash_over_grouped_x": round(t_hash / t_grp, 2),
         "est_hash_s": est_h, "est_grouped_s": est_g},
    )
