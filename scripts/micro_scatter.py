"""Are scatter-adds descriptor-rate-bound like gathers? The chunked
expansion issues 4 nnzA-sized scatter-adds (delta propagation) plus the
chunk-start scatter; if each costs a ~138 M/s descriptor, fusing them
matters. Measures: N separate 1D scatter-adds vs one 2D column scatter vs
one scatter of a packed (cap, 2)-table, all at nnzA=2^20 scale.
    python scripts/micro_scatter.py
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
    nnz = 1 << 20
    cap = 1 << 23

    def mk(seed):
        r = np.random.default_rng(seed)
        starts = np.sort(r.integers(0, cap, nnz).astype(np.int32))
        deltas = r.integers(-1000, 1000, (4, nnz)).astype(np.int32)
        return jnp.asarray(starts), jnp.asarray(deltas)

    sets = [mk(s) for s in range(6)]

    from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

    def probe(*arrs):
        # parity-masked: plain sum(scatter/cumsum) folds algebraically
        return runtime_zero_probe(*[x.reshape(-1) for x in arrs])

    # a) 4 separate 1D scatter-adds + cumsum each (current implementation)
    @jax.jit
    def sep(starts, deltas):
        outs = []
        for q in range(4):
            acc = jnp.zeros(cap, jnp.int32).at[starts].add(
                deltas[q], mode="drop"
            )
            outs.append(jnp.cumsum(acc))
        return probe(*outs)

    # b) one 2D scatter into (cap, 4) + cumsum along axis 0
    @jax.jit
    def packed2d(starts, deltas):
        acc = jnp.zeros((cap, 4), jnp.int32).at[starts, :].add(
            deltas.T, mode="drop"
        )
        return probe(jnp.cumsum(acc, axis=0))

    # c) scatter only (no cumsum) to isolate scatter vs scan cost
    @jax.jit
    def scat1(starts, deltas):
        acc = jnp.zeros(cap, jnp.int32).at[starts].add(deltas[0], mode="drop")
        return probe(acc)

    # d) cumsum only
    @jax.jit
    def cums(starts, deltas):
        x = jnp.zeros(cap, jnp.int32).at[0].set(deltas[0, 0])
        return probe(jnp.cumsum(x + starts[0]))

    for name, fn in (("4x sep scatter+cumsum", sep),
                     ("2D packed scatter+cumsum", packed2d),
                     ("1x scatter only", scat1),
                     ("1x cumsum only", cums)):
        dt = t(fn, sets)
        print(f"{name:26s}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
