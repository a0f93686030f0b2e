"""Per-stage TPU profiling of the SpGEMM pipeline — find where the time goes.

Times each pipeline stage in isolation (jitted, block_until_ready) on the
real chip, for representative suite matrices. Run:
    python scripts/profile_stages.py [matrix ...]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu import CSR, pad_bucket
from benchmark_spgemm_using_csr_tpu.ops import symbolic
from benchmark_spgemm_using_csr_tpu.ops.esc import (
    expand_products,
    sort_compress,
    spgemm_esc_padded,
)
from benchmark_spgemm_using_csr_tpu.ops.binned import (
    _bin_numeric,
    make_plan,
    spgemm_binned_host,
)
from benchmark_spgemm_using_csr_tpu.utils import generators


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def profile_matrix(name: str):
    a = CSR.from_scipy(generators.SUITE[name]())
    m = a.m
    nnz_a = int(np.asarray(a.rowptr)[-1])
    total = int(jax.jit(symbolic.total_products)(a, a))
    cap = pad_bucket(total)
    flops = 2 * total
    print(f"\n=== {name}: m={m} nnzA={nnz_a} products={total} cap={cap} ===")

    t = timeit(jax.jit(symbolic.nnz_upper_bound), a, a)
    print(f"symbolic       : {t*1e3:8.2f} ms")

    expand = jax.jit(partial(expand_products, prod_capacity=cap))
    t_expand = timeit(expand, a, a)
    print(f"expand         : {t_expand*1e3:8.2f} ms")

    row, col, val = expand(a, a)

    sort_only = jax.jit(lambda r, c, v: jax.lax.sort((r, c, v), num_keys=2))
    t_sort = timeit(sort_only, row, col, val)
    print(f"sort (3-tuple) : {t_sort*1e3:8.2f} ms")

    sc = jax.jit(partial(sort_compress, m=m, out_capacity=cap))
    t_sc = timeit(lambda: sc(row, col, val))
    print(f"sort_compress  : {t_sc*1e3:8.2f} ms")

    t_esc = timeit(
        lambda: spgemm_esc_padded(a, a, prod_capacity=cap, out_capacity=cap)
    )
    print(f"esc end-to-end : {t_esc*1e3:8.2f} ms -> {flops/t_esc/1e9:.3f} GFlops")

    # --- binned path breakdown ---
    nnz_ct_dev = jax.jit(symbolic.nnz_upper_bound)(a, a)
    nnz_ct = np.asarray(nnz_ct_dev)
    prodstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nnz_ct_dev).astype(jnp.int32)]
    )
    t0 = time.perf_counter()
    bins, tail = make_plan(nnz_ct)
    t_plan = time.perf_counter() - t0
    print(f"host make_plan : {t_plan*1e3:8.2f} ms  bins={{w: len(r) for w, r in bins.items()}} tail={tail.size}")
    for w, rows in bins.items():
        rows_dev = jnp.asarray(rows)
        t_bin = timeit(
            partial(_bin_numeric, width=w), a, a, rows_dev, nnz_ct_dev, prodstart
        )
        print(f"bin w={w:4d}     : {t_bin*1e3:8.2f} ms  ({rows.size} rows)")

    t_binned = timeit(lambda: spgemm_binned_host(a, a, prod_capacity=cap))
    print(f"binned e2e     : {t_binned*1e3:8.2f} ms -> {flops/t_binned/1e9:.3f} GFlops")


if __name__ == "__main__":
    names = sys.argv[1:] or ["er_medium", "powerlaw_medium"]
    print("backend:", jax.default_backend(), jax.devices())
    for n in names:
        profile_matrix(n)
