"""Timing-methodology validation + op-cost scaling on the axon TPU.

Checks whether block_until_ready is trustworthy (vs forcing a D2H copy),
and how gather/sort/cumsum costs scale with size.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t_block(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def t_d2h(fn, *args, n=5, warmup=2):
    """Force a D2H of one element — guarantees the compute graph ran."""
    for _ in range(warmup):
        _ = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)

    for k in [1024, 2048, 4096]:
        a = jnp.asarray(rng.standard_normal((k, k)).astype(np.float32))
        mm = jax.jit(lambda a: a @ a)
        tb = t_block(mm, a)
        td = t_d2h(mm, a)
        fl = 2 * k**3
        print(f"matmul {k}: block {tb*1e3:8.3f} ms ({fl/tb/1e12:7.1f} TF) | d2h {td*1e3:8.3f} ms ({fl/td/1e12:7.1f} TF)")

    for size in [1 << 17, 1 << 20, 1 << 23]:
        tbl = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, size, size).astype(np.int32))
        gather = jax.jit(lambda t, i: t[i])
        tb = t_block(gather, tbl, idx)
        td = t_d2h(gather, tbl, idx)
        print(f"gather {size:9d}: block {tb*1e3:8.2f} ms | d2h {td*1e3:8.2f} ms ({size/td/1e6:6.0f} M/s)")

    # gather from a 2D table (4 fields packed) vs 4 separate gathers
    size = 1 << 23
    tbl4 = jnp.asarray(rng.standard_normal((size, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, size, size).astype(np.int32))
    g4 = jax.jit(lambda t, i: t[i])
    g1x4 = jax.jit(lambda t, i: (t[i, 0], t[i, 1], t[i, 2], t[i, 3]))
    print(f"gather 8M x4-packed : {t_d2h(g4, tbl4, idx)*1e3:8.2f} ms")
    print(f"gather 8M 4-separate: {t_d2h(g1x4, tbl4, idx)*1e3:8.2f} ms")

    for size in [1 << 20, 1 << 23, 1 << 24]:
        x = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        cs = jax.jit(jnp.cumsum)
        print(f"cumsum {size>>20:3d}M: {t_d2h(cs, x)*1e3:8.2f} ms")

    size = 1 << 23
    k32 = jnp.asarray(rng.integers(0, 1 << 30, size).astype(np.int32))
    r32 = jnp.asarray(rng.integers(0, 1 << 16, size).astype(np.int32))
    v = jnp.asarray(rng.standard_normal(size).astype(np.float32))
    s2 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    s3 = jax.jit(lambda r, c, v: jax.lax.sort((r, c, v), num_keys=2))
    print(f"sort 8M (k,v)    : {t_d2h(s2, k32, v)*1e3:8.2f} ms")
    print(f"sort 8M (r,c,v)  : {t_d2h(s3, r32, k32, v)*1e3:8.2f} ms")

    # segmented-scan compress vs segment_sum approach, 8M
    def seg_scan(col, val):
        run = val
        k = 1
        while k < 32:  # partial; just cost scaling of shift-add passes
            shifted = jnp.concatenate([jnp.zeros(k, val.dtype), run[:-k]])
            same = jnp.concatenate([jnp.zeros(k, jnp.bool_), col[k:] == col[:-k]])
            run = run + jnp.where(same, shifted, 0)
            k *= 2
        return run

    print(f"seg-scan 5 passes 8M: {t_d2h(jax.jit(seg_scan), k32, v)*1e3:8.2f} ms")

    sc = jax.jit(lambda i, v: jnp.zeros(1 << 16, jnp.float32).at[i].add(v))
    print(f"scatter-add 8M->64k : {t_d2h(sc, r32, v)*1e3:8.2f} ms")
    scs = jax.jit(
        lambda i, v: jnp.zeros(1 << 16, jnp.float32).at[jnp.sort(i)].add(
            v, indices_are_sorted=True
        )
    )
    print(f"sorted scatter-add  : {t_d2h(scs, r32, v)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
