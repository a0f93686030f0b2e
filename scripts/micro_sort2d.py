"""Does XLA TPU sort get cheaper per element on shorter lane segments?

Sorts the SAME 16M-element (u32 key, f32 val) stream as one 1D sort vs
(R, N/R) independent lane sorts. If per-element cost drops ~log(N/R)/log(N)
(or faster, bitonic log^2), a row-blocked product stream could cut the
chunked pipeline's sort stage. K-scan with varied inputs (tunnel caching
trap, CLAUDE.md); probes interior order statistics so XLA cannot rewrite
the sort into a reduce (CLAUDE.md sort-micro trap).
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

K_ITERS = 8
N = 1 << 24  # 16M


def make_sort(rows: int):
    cols = N // rows

    @jax.jit
    def run(keys, vals):
        def body(c, _):
            k2 = (c[0].reshape(rows, cols), c[1].reshape(rows, cols))
            sk, sv = jax.lax.sort(k2, dimension=1, num_keys=1)
            # probe interior order statistics of every lane-row
            probe = (
                sk[:, cols // 3].astype(jnp.uint32).sum()
                + sk[:, (2 * cols) // 3].astype(jnp.uint32).sum()
            )
            pv = sv[:, cols // 2].sum()
            newk = c[0] ^ (probe & jnp.uint32(1))
            newv = c[1] + 0.0 * pv
            return (newk, newv), probe

        (_, _), outs = jax.lax.scan(body, (keys, vals), None, length=K_ITERS)
        return outs

    return run


def t(fn, keys, vals, n=3, warmup=1):
    i = 0

    def varied():
        nonlocal i
        i += 1
        return jax.block_until_ready(keys ^ jnp.uint32(i)), vals

    for _ in range(warmup):
        jax.block_until_ready(fn(*varied()))
    ts = []
    for _ in range(n):
        kv = varied()
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*kv))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K_ITERS


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    vals = jnp.asarray(rng.random(N, dtype=np.float32))
    for rows in (1, 64, 1024):
        ms = t(make_sort(rows), keys, vals) * 1e3
        print(
            f"rows={rows:5d} seg={N // rows:9d}  {ms:8.2f} ms "
            f"({ms * 1e6 / N:5.2f} ns/elem)"
        )


if __name__ == "__main__":
    main()
