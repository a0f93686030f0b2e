"""XLA:TPU sort cost scaling — operands, key count, and length.

Informs the row-blocked packed-key design: how much does dropping from
(row, col, val) num_keys=2 to (rc_packed, val) num_keys=1 actually save,
and how does cost scale with stream length?
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def t(fn, *args, n=4, warmup=2):
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
    for N in (1 << 21, 12 * (1 << 20)):
        r = jnp.asarray(rng.integers(0, 1 << 16, N).astype(np.int32))
        c = jnp.asarray(rng.integers(0, 1 << 16, N).astype(np.int32))
        v = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        rc = (r << 15) | (c >> 1)  # packed-ish 31-bit key
        cases = {
            "1op 1key (rc)": lambda: jax.lax.sort((rc,), num_keys=1),
            "2op 1key (rc,val)": lambda: jax.lax.sort((rc, v), num_keys=1),
            "3op 1key (rc,c,v)": lambda: jax.lax.sort((rc, c, v), num_keys=1),
            "3op 2key (r,c,v)": lambda: jax.lax.sort((r, c, v), num_keys=2),
            "4op 2key (r,c,v,v)": lambda: jax.lax.sort((r, c, v, v), num_keys=2),
        }
        print(f"\nN = {N} ({N/2**20:.0f} Mi)")
        for label, fn in cases.items():
            jf = jax.jit(fn)
            dt = t(jf)
            print(f"{label:20s}: {dt*1e3:8.2f} ms  ({dt/N*1e9:5.2f} ns/elem)")


if __name__ == "__main__":
    main()
