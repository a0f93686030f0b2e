"""Find the fastest slice-gather lowering on this TPU for the chunked
expansion: 1M chunks x K contiguous (col,val) pairs from an HBM table."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    cap = 1 << 20  # B nnz capacity
    nchunks = 1 << 20
    K = 16

    tbl = jnp.asarray(rng.integers(0, 1 << 30, (cap, 2)).astype(np.int32))
    tbl_t = jnp.asarray(np.asarray(tbl).T.copy())  # (2, cap)
    tbl_flat = tbl.reshape(-1)  # interleaved (cap*2,)
    tbl_c = jnp.asarray(rng.integers(0, 1 << 30, cap).astype(np.int32))
    tbl_v = jnp.asarray(rng.standard_normal(cap).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, cap - K, nchunks).astype(np.int32))

    # 1. vmap(dynamic_slice) on (cap, 2) — current implementation
    f1 = jax.jit(
        lambda p: jax.vmap(lambda q: jax.lax.dynamic_slice(tbl, (q, 0), (K, 2)))(p)
    )
    print(f"vmap dyn_slice (cap,2) : {t(f1, pos)*1e3:9.2f} ms")

    # 2. vmap(dynamic_slice) separate col/val 1D tables
    f2 = jax.jit(
        lambda p: (
            jax.vmap(lambda q: jax.lax.dynamic_slice(tbl_c, (q,), (K,)))(p),
            jax.vmap(lambda q: jax.lax.dynamic_slice(tbl_v, (q,), (K,)))(p),
        )
    )
    print(f"vmap dyn_slice 2x1D    : {t(f2, pos)*1e3:9.2f} ms")

    # 3. advanced-indexing gather, full index matrix
    lane = jnp.arange(K, dtype=jnp.int32)
    f3 = jax.jit(lambda p: tbl[p[:, None] + lane[None, :], :])
    print(f"adv-index (cap,2)      : {t(f3, pos)*1e3:9.2f} ms")

    f3b = jax.jit(
        lambda p: (tbl_c[p[:, None] + lane[None, :]], tbl_v[p[:, None] + lane[None, :]])
    )
    print(f"adv-index 2x1D         : {t(f3b, pos)*1e3:9.2f} ms")

    # 4. interleaved flat: one gather of 2K from (cap*2,)
    lane2 = jnp.arange(2 * K, dtype=jnp.int32)
    f4 = jax.jit(lambda p: tbl_flat[(2 * p)[:, None] + lane2[None, :]])
    print(f"adv-index flat 2K      : {t(f4, pos)*1e3:9.2f} ms")

    # 5. transposed table (2, cap): slice along lanes
    f5 = jax.jit(
        lambda p: jax.vmap(lambda q: jax.lax.dynamic_slice(tbl_t, (0, q), (2, K)))(p)
    )
    print(f"vmap dyn_slice (2,cap) : {t(f5, pos)*1e3:9.2f} ms")

    # 6. lax.gather with slice_sizes=(K,2) explicitly
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    starts = jnp.stack([pos, jnp.zeros_like(pos)], axis=1)
    f6 = jax.jit(
        lambda s: jax.lax.gather(
            tbl, s, dn, slice_sizes=(K, 2), mode=jax.lax.GatherScatterMode.CLIP
        )
    )
    print(f"lax.gather slices      : {t(f6, starts)*1e3:9.2f} ms")

    # 7. plain element gather baseline (same total elements)
    idx = jnp.asarray(rng.integers(0, cap, nchunks * K).astype(np.int32))
    f7 = jax.jit(lambda i: tbl_v[i])
    print(f"element gather 16M     : {t(f7, idx)*1e3:9.2f} ms")

    # 8. sorted-ish element gather (chunk-local contiguity preserved)
    idx_sorted = jnp.sort(idx)
    print(f"element gather sorted  : {t(f7, idx_sorted)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
