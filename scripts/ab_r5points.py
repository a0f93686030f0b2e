"""Best-backend A/B records for the round-5 suite points (VERDICT r4 #6
done-criterion: each new point gets a dispatcher-choice-vs-runner-up row).

Points: road_1m (ultra-short rows), smallworld_400k (Watts-Strogatz),
consph_83k (second mid-FEM density, regular mesh -> DIA). For each, the
dispatcher's cost-model ranking is printed, the top TWO feasible backends
are measured with the K-scan delta harness, and one results.jsonl row
records both (or the structural reason the runner-up is infeasible).

Run on the real chip: python scripts/ab_r5points.py [point ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu import spgemm_flops
from benchmark_spgemm_using_csr_tpu.ops import dispatch as D
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.sparse.dia import DIA
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)

K = 8


def csr_kfac(fn, a, b):
    def kfac(k=K):
        @jax.jit
        def run(a_c):
            def body(a_i, _):
                c = fn(a_i, b if b is not a else a_i)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_i.vals.dtype)
                return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps,
                           a_i.shape), c.rowptr[-1]
            _, outs = jax.lax.scan(body, a_c, None, length=k)
            return outs
        return run
    return kfac


def build(meth, a, b, a_sp):
    """(callable(a, b) -> CSR-like, vary, kfac) or (None, reason)."""
    if meth == "grouped":
        from benchmark_spgemm_using_csr_tpu.ops.grouped import (
            make_grouped_plan, spgemm_grouped,
        )

        sched = make_grouped_plan(a, b)
        if sched is None:
            return None, "grouped plan None (regime gate: >2^27 products?)"
        fn = lambda u, v, s=sched: spgemm_grouped(u, v, s)
        return (csr_kfac(fn, a, b), _csr_vary(a)), None
    if meth == "chunked":
        from benchmark_spgemm_using_csr_tpu.ops.chunked import (
            make_chunked_plan, spgemm_chunked,
        )

        try:
            plan = make_chunked_plan(a, b)
        except Exception as e:
            return None, f"chunked plan failed: {e!r}"
        fn = lambda u, v, p=plan: spgemm_chunked(u, v, p)
        return (csr_kfac(fn, a, b), _csr_vary(a)), None
    if meth == "tilepack":
        from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
            make_tilepack_plan, spgemm_tilepack,
        )

        sched = make_tilepack_plan(a, b)
        if sched is None:
            return None, "tilepack plan None (rows exceed tile lanes?)"
        fn = lambda u, v, s=sched: spgemm_tilepack(u, v, s)
        return (csr_kfac(fn, a, b), _csr_vary(a)), None
    if meth == "dia":
        from benchmark_spgemm_using_csr_tpu.ops.dia import dia_spgemm

        a_d = DIA.from_scipy(a_sp)

        def kfac(k=K):
            @jax.jit
            def run(plane):
                def body(pl, _):
                    a_i = DIA(pl, a_d.offsets, a_d.shape)
                    c = dia_spgemm(a_i, a_i)
                    eps = runtime_zero_probe(
                        c.data.reshape(-1)
                    ).astype(pl.dtype)
                    return pl + eps, c.data[0, 0]
                _, outs = jax.lax.scan(body, plane, None, length=k)
                return outs
            return run

        return (kfac, lambda i: (a_d.data + jnp.float32(1e-6) * i,)), None
    return None, f"method {meth} not wired in this A/B"


def _csr_vary(a):
    return lambda i: (
        CSR(a.rowptr, a.colidx,
            a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape),
    )


def main():
    points = sys.argv[1:] or ["road_1m", "smallworld_400k", "consph_83k"]
    for name in points:
        a_sp = generators.SUITE[name]()
        a = CSR.from_scipy(a_sp)
        flops = spgemm_flops(a, a)
        est = {
            "chunked": D.estimate_chunked_s(a),
            "dia": D.estimate_dia_s(a),
            "tilepack": D.estimate_tilepack_s(a),
            "grouped": D.estimate_grouped_s(a),
            "bsr": D.estimate_bsr_s(a, a),
            "dense": D.estimate_dense_s(a),
        }
        ranked = sorted(est, key=est.get)
        print(f"\n{name}: cost-model ranking "
              f"{[(m, round(est[m], 4)) for m in ranked[:3]]}", flush=True)
        row = {"matrix": name, "config": "ab_r5points top2", "flops": flops}
        measured = 0
        for meth in ranked:
            if measured >= 2:
                break
            built, reason = build(meth, a, a, a_sp)
            if built is None:
                print(f"  {meth}: INFEASIBLE — {reason}", flush=True)
                row[f"{meth}_infeasible"] = reason
                measured += 1  # a recorded reason counts as the A/B slot
                continue
            kfac, vary = built
            try:
                d = bench_delta_stats(
                    kfac, vary, k1=K, name=f"{name}_{meth}", flops=flops
                )
            except Exception as e:  # compile/HBM OOM is a valid verdict
                reason = str(e)[:200]
                print(f"  {meth}: INFEASIBLE at runtime — {reason}",
                      flush=True)
                row[f"{meth}_infeasible"] = reason
                measured += 1
                continue
            gf = flops / d.per_s / 1e9
            print(f"  {meth}: {d.per_s*1e3:.2f} ms = {gf:.3f} GF "
                  f"(spread {d.spread:.1%})", flush=True)
            row[f"{meth}_s"] = d.per_s
            row[f"{meth}_gflops"] = round(gf, 4)
            measured += 1
        write_result("results.jsonl", row)


if __name__ == "__main__":
    main()
