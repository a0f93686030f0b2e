"""Scatter-add descriptor rate, measured honestly (in-graph K-scan with
varied carried input + parity probe; the block_until_ready-based
micro_scatter.py v1 measured 0.03 ms — deferred execution, not truth).

The chunked expansion issues 4 nnzA-sized scatter-adds at the same sorted
positions (delta propagation). Candidates to cut that cost:
  sep4    : 4 x 1D scatter-add + cumsum each      (current implementation)
  sep1    : 1 x 1D scatter-add + cumsum           (per-scatter marginal)
  fused2d : one (4, cap) scatter along axis 1 + 4 lane-axis cumsums
  vec4    : one (cap, 4) scatter with 4-wide update windows + axis-0 cumsum
    python scripts/micro_scatter2.py
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
NNZ = 1 << 19  # ~er's nnzA (590k)
CAP = 5 << 20  # ~er's chunks_cap


def variant(name):
    if name == "sep4":
        def fn(starts, deltas):
            outs = []
            for q in range(4):
                acc = jnp.zeros(CAP, jnp.int32).at[starts].add(
                    deltas[q], mode="drop"
                )
                outs.append(jnp.cumsum(acc))
            return outs
    elif name == "sep1":
        def fn(starts, deltas):
            acc = jnp.zeros(CAP, jnp.int32).at[starts].add(
                deltas[0], mode="drop"
            )
            return [jnp.cumsum(acc)]
    elif name == "fused2d":
        def fn(starts, deltas):
            acc = jnp.zeros((4, CAP), jnp.int32).at[:, starts].add(
                deltas, mode="drop"
            )
            c = jnp.cumsum(acc, axis=1)
            return [c[q] for q in range(4)]
    elif name == "vec4":
        def fn(starts, deltas):
            acc = jnp.zeros((CAP, 4), jnp.int32).at[starts, :].add(
                deltas.T, mode="drop"
            )
            c = jnp.cumsum(acc, axis=0)
            return [c[:, q] for q in range(4)]
    return fn


def bench(fn):
    @jax.jit
    def scan(starts0, deltas0):
        def body(carry, _):
            starts, deltas = carry
            outs = fn(starts, deltas)
            eps = runtime_zero_probe(*outs).astype(jnp.int32)
            return (starts + eps, deltas + eps), outs[0][-1]

        _, o = jax.lax.scan(body, (starts0, deltas0), None, length=K_ITERS)
        return o

    rng = np.random.default_rng(0)

    def mk(s):
        starts = np.sort(rng.integers(0, CAP, NNZ).astype(np.int32))
        deltas = rng.integers(-1000, 1000, (4, NNZ)).astype(np.int32)
        return jnp.asarray(starts), jnp.asarray(deltas)

    jax.block_until_ready(scan(*mk(0)))
    ts = []
    for i in range(3):
        a = [jax.block_until_ready(x) for x in mk(i + 1)]
        t0 = time.perf_counter()
        jax.block_until_ready(scan(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K_ITERS


def main():
    print(f"backend: {jax.devices()}  nnz={NNZ/1e3:.0f}k cap={CAP/1e6:.1f}M")
    for name in ("sep1", "sep4", "fused2d", "vec4"):
        try:
            dt = bench(variant(name))
            print(f"  {name:8s}: {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:8s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
