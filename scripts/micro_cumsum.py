"""How expensive is jnp.cumsum on TPU at chunk-stream sizes, and can a
manual scan beat it? The chunked pipeline runs ~32M elements of cumsum per
SpGEMM (4 delta-propagations + uniq_pos); the meta stage measures 49 ms on
er — if cumsum is the culprit, swap in the winner here.

K-scan in-graph methodology (tunnel caching + DCE traps): each variant runs
K times inside one jit with varied input, parity-probed.
    python scripts/micro_cumsum.py
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

from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

K_ITERS = 8


def cumsum_doubling(x):
    """Hillis-Steele inclusive scan: log2(n) shift-add passes."""
    n = x.shape[0]
    s = 1
    while s < n:
        x = x + jnp.concatenate([jnp.zeros(s, x.dtype), x[:-s]])
        s <<= 1
    return x


def cumsum_2level(x, lanes=4096):
    """Reshape (rows, lanes): scan lanes per row, add exclusive row offsets."""
    n = x.shape[0]
    rows = n // lanes
    t = x[: rows * lanes].reshape(rows, lanes)
    t = jnp.cumsum(t, axis=1)
    row_tot = t[:, -1]
    off = jnp.cumsum(row_tot) - row_tot
    t = t + off[:, None]
    flat = t.reshape(-1)
    if rows * lanes < n:
        tail = jnp.cumsum(x[rows * lanes:]) + flat[-1]
        flat = jnp.concatenate([flat, tail])
    return flat


def cumsum_2level_doubling(x, lanes=4096):
    """2-level with doubling for the row-offset scan (all-vector)."""
    n = x.shape[0]
    rows = n // lanes
    t = x[: rows * lanes].reshape(rows, lanes)
    t = jnp.cumsum(t, axis=1)
    row_tot = t[:, -1]
    off = cumsum_doubling(row_tot) - row_tot
    flat = (t + off[:, None]).reshape(-1)
    if rows * lanes < n:
        base = jnp.where(rows > 0, flat[-1], 0)
        tail = jnp.cumsum(x[rows * lanes:]) + base
        flat = jnp.concatenate([flat, tail])
    return flat


VARIANTS = {
    "jnp.cumsum": jnp.cumsum,
    "associative_scan": lambda x: jax.lax.associative_scan(jnp.add, x),
    "doubling": cumsum_doubling,
    "2level(jnp rows)": cumsum_2level,
    "2level(doubling)": cumsum_2level_doubling,
}


def bench(fn, n):
    @jax.jit
    def scan(x0):
        def body(x, _):
            y = fn(x)
            eps = runtime_zero_probe(y).astype(x.dtype)
            return x + eps.astype(x.dtype), y[-1]

        _, outs = jax.lax.scan(body, x0, None, length=K_ITERS)
        return outs

    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(
        rng.integers(-100, 100, n).astype(np.int32) + s
    )
    jax.block_until_ready(scan(mk(0)))
    ts = []
    for i in range(3):
        x = jax.block_until_ready(mk(i + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(scan(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K_ITERS


def main():
    print("backend:", jax.devices())
    for n in (1 << 20, 5 << 20, 10 << 20):
        print(f"\nn = {n/1e6:.1f}M int32")
        ref = np.cumsum(
            np.arange(1, 1000, dtype=np.int64)
        )  # sanity only
        for name, fn in VARIANTS.items():
            # correctness check (small)
            small = jnp.asarray(
                np.random.default_rng(1).integers(-5, 5, 10000).astype(np.int32)
            )
            got = np.asarray(jax.jit(fn)(small))
            want = np.cumsum(np.asarray(small))
            assert (got == want).all(), name
            dt = bench(fn, n)
            print(f"  {name:18s}: {dt*1e3:8.2f} ms  ({dt/n*1e9:5.2f} ns/elem)")


if __name__ == "__main__":
    main()
