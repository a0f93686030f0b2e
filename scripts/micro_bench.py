"""TPU microbenchmarks: dispatch overhead, expansion variants, sort, scatter.

Grounds the optimization decisions for the hot path. Run from repo root:
    python -u scripts/micro_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / n


def main():
    print("backend:", jax.default_backend(), jax.devices())

    x = jnp.ones(8, jnp.float32)
    f = jax.jit(lambda x: x + 1)
    mn, mean = timeit(f, x)
    print(f"dispatch floor (tiny jit)    : min {mn*1e3:7.2f} ms  mean {mean*1e3:7.2f} ms")

    big = jnp.ones((2048, 2048), jnp.float32)
    g = jax.jit(lambda a: a @ a)
    mn, _ = timeit(g, big)
    print(f"2048^3 matmul (17 GFlop)     : min {mn*1e3:7.2f} ms -> {17.2/mn:.0f} GFlops")

    # --- expansion variants ---
    rng = np.random.default_rng(0)
    for nnz_a, cap in [(32768, 1 << 19), (786432, 1 << 24)]:
        per_nz = jnp.asarray(rng.integers(1, 30, nnz_a).astype(np.int32))

        def expand_searchsorted(per_nz):
            ends = jnp.cumsum(per_nz)
            g = jnp.arange(cap, dtype=jnp.int32)
            src = jnp.searchsorted(ends, g, side="right").astype(jnp.int32)
            return src

        def expand_scatter(per_nz):
            ends = jnp.cumsum(per_nz)
            starts = ends - per_nz
            hits = jnp.zeros(cap, jnp.int32).at[starts].add(1, mode="drop")
            src = jnp.cumsum(hits) - 1
            return src

        f1 = jax.jit(expand_searchsorted)
        f2 = jax.jit(expand_scatter)
        t1, _ = timeit(f1, per_nz)
        t2, _ = timeit(f2, per_nz)
        np.testing.assert_array_equal(
            np.asarray(f1(per_nz))[: int(np.asarray(jnp.sum(per_nz)))],
            np.asarray(f2(per_nz))[: int(np.asarray(jnp.sum(per_nz)))],
        )
        print(f"expand nnzA={nnz_a:7d} cap=2^{int(np.log2(cap))}: searchsorted {t1*1e3:8.2f} ms | scatter+cumsum {t2*1e3:8.2f} ms")

    # --- gather cost (random vs contiguous) ---
    for size in [1 << 19, 1 << 24]:
        tbl = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        idx_r = jnp.asarray(rng.integers(0, size, size).astype(np.int32))
        idx_c = jnp.arange(size, dtype=jnp.int32)
        gather = jax.jit(lambda t, i: t[i])
        tr, _ = timeit(gather, tbl, idx_r)
        tc, _ = timeit(gather, tbl, idx_c)
        gbps = size * 8 / tr / 1e9
        print(f"gather {size>>20}M: random {tr*1e3:8.2f} ms ({gbps:.1f} GB/s) | contiguous {tc*1e3:8.2f} ms")

    # --- scatter-add cost (the hash path's core) ---
    for size, n in [(1 << 19, 4096), (1 << 24, 65536)]:
        idx = jnp.asarray(rng.integers(0, n, size).astype(np.int32))
        val = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        sadd = jax.jit(lambda i, v: jnp.zeros(n, jnp.float32).at[i].add(v))
        t, _ = timeit(sadd, idx, val)
        print(f"scatter-add {size>>20}M -> {n}: {t*1e3:8.2f} ms ({size/t/1e6:.0f} M/s)")

    # --- segment_sum (sorted ids) ---
    for size, m in [(1 << 19, 4096), (1 << 24, 65536)]:
        ids = jnp.sort(jnp.asarray(rng.integers(0, m, size).astype(np.int32)))
        val = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        ss = jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=m))
        t, _ = timeit(ss, ids, val)
        print(f"segment_sum {size>>20}M -> {m}: {t*1e3:8.2f} ms")

    # --- 1D sort ---
    for size in [1 << 19, 1 << 22, 1 << 24]:
        keys = jnp.asarray(rng.integers(0, 1 << 30, size).astype(np.int32))
        v1 = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        s1 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        t, _ = timeit(s1, keys, v1)
        print(f"1D sort {size>>20}M pairs: {t*1e3:8.2f} ms")

    # --- batched lane sort (R, W) ---
    for r, w in [(4096, 128), (32768, 128), (8192, 512)]:
        k2 = jnp.asarray(rng.integers(0, 1 << 30, (r, w)).astype(np.int32))
        v2 = jnp.asarray(rng.standard_normal((r, w)).astype(np.float32))
        s2 = jax.jit(lambda k, v: jax.lax.sort((k, v), dimension=1, num_keys=1))
        t, _ = timeit(s2, k2, v2)
        print(f"lane sort ({r},{w}): {t*1e3:8.2f} ms ({r*w/t/1e6:.0f} M elem/s)")


if __name__ == "__main__":
    main()
