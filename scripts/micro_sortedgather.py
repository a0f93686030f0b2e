"""Does index LOCALITY lift the gather descriptor rate above the random
wall (~125 M desc/s narrow)? If sorted/clustered indices gather much
faster, the chunked expansion should process A entries in column-sorted
order (descriptors then sweep B near-sequentially).
    python scripts/micro_sortedgather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def t(fn, args_list, n=4, warmup=1):
    # args vary per run (tunnel identical-dispatch caching trap)
    for i in range(warmup):
        jax.block_until_ready(fn(*args_list[i % len(args_list)]))
    ts = []
    for i in range(n):
        a = args_list[(warmup + i) % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    cap = 1 << 20          # B table rows (like er: 590k nnzB)
    g = 1 << 23            # 8.4M descriptors (like er products)
    tbl = jnp.asarray(rng.integers(0, 1 << 30, (cap, 2)).astype(np.int32))

    def variants(seed):
        r = np.random.default_rng(seed)
        rand = r.integers(0, cap, g).astype(np.int32)
        srt = np.sort(rand)
        # "blocky": sorted within 4k-element blocks (what a col-sorted A
        # entry stream actually produces per chunk region)
        blocky = rand.reshape(-1, 4096)
        blocky = np.sort(blocky, axis=1).reshape(-1)
        return (
            jnp.asarray(rand),
            jnp.asarray(srt),
            jnp.asarray(blocky),
        )

    sets = [variants(s) for s in range(6)]
    fn = jax.jit(lambda idx: tbl[idx, :].sum(dtype=jnp.int32))
    for name, pick in (("random", 0), ("sorted", 1), ("block4k-sorted", 2)):
        args = [(s[pick],) for s in sets]
        dt = t(fn, args)
        print(f"{name:16s}: {dt*1e3:8.2f} ms  ({g/dt/1e6:6.0f} M desc/s)")


if __name__ == "__main__":
    main()
