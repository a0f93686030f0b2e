"""XLA:TPU sort device-time scaling, K-scan amortized (the ~26 ms axon
dispatch floor swallows any standalone sort — scripts/micro_sort.py showed
flat 26 ms for 2Mi..12Mi; this measures the real device cost).

Probe interior order statistics of the sorted output: consuming only [-1]
lets XLA rewrite the whole sort as a max-reduction (measured 0 ms).
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

K = 8
FLOOR_REF = None  # measured null-dispatch floor, subtracted


def time_blocked(run, ops, n=4, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(run(ops))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(ops))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    global FLOOR_REF
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    null = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros(8, jnp.float32)
    jax.block_until_ready(null(x0))
    FLOOR_REF = min(
        time_blocked(null, x0, n=6) for _ in range(2)
    )
    print(f"dispatch floor: {FLOOR_REF*1e3:.2f} ms (subtracted below)")

    for N in (1 << 21, 12 * (1 << 20)):
        r = jnp.asarray(rng.integers(0, 1 << 16, N).astype(np.int32))
        c = jnp.asarray(rng.integers(0, 1 << 16, N).astype(np.int32))
        v = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        rc = (r << 15) | (c >> 1)
        cases = {
            "1op 1key (rc)": ((rc,), 1),
            "2op 1key (rc,v)": ((rc, v), 1),
            "3op 1key (rc,c,v)": ((rc, c, v), 1),
            "3op 2key (r,c,v)": ((r, c, v), 2),
        }
        print(f"\nN = {N} ({N/2**20:.0f} Mi)")
        for label, (ops, nk) in cases.items():

            @jax.jit
            def run(ops, nk=nk):
                def body(ops, _):
                    out = jax.lax.sort(ops, num_keys=nk)
                    n_ = out[0].shape[0]
                    probe = sum(
                        out[0][(j * n_) // 9].astype(jnp.float32)
                        for j in range(1, 9)
                    )  # f32: no int overflow, so runtime value is positive
                    eps = jnp.minimum(probe, 0.0).astype(ops[0].dtype)
                    return (
                        tuple(o + eps if i == 0 else o for i, o in enumerate(ops)),
                        probe,
                    )

                _, outs = jax.lax.scan(body, ops, None, length=K)
                return outs

            dt = (time_blocked(run, ops) - FLOOR_REF) / K
            print(f"{label:20s}: {dt*1e3:8.2f} ms device ({dt/N*1e9:5.2f} ns/elem)")


if __name__ == "__main__":
    main()
