"""Does is_stable=False make the (G, W) grouped sort cheaper on TPU?

Every hot sort in the package uses jax.lax.sort's DEFAULT is_stable=True.
XLA's stable sort on TPU typically tie-breaks by threading an extra iota
operand through the comparator network — pure overhead for SpGEMM, where
equal keys are merged by SUMMING their values (order among duplicates is
irrelevant) and every pad slot carries the same all-ones sentinel.

Measures the production 2-operand (u32 key, f32 val) 2D sort at the two
grouped suite shapes that dominate the weak points (scircuit 352x131072,
femirr 1664x32768), stable vs unstable, via K-scan deltas with varied
inputs and interior-order-statistic probes (CLAUDE.md sort-micro traps).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)


def make(rows: int, cols: int, stable: bool, nops: int, k: int):
    @jax.jit
    def run(keys, vals):
        def body(c, _):
            ck, cv = c
            ops = (ck.reshape(rows, cols), cv.reshape(rows, cols))
            if nops == 3:
                ops = ops + (cv.reshape(rows, cols),)
            out = jax.lax.sort(
                ops, dimension=1, num_keys=1, is_stable=stable
            )
            sk, sv = out[0], out[1]
            # interior order statistics of every row (reduce-rewrite trap)
            probe = (
                sk[:, cols // 3].astype(jnp.uint32).sum()
                + sk[:, (2 * cols) // 3].astype(jnp.uint32).sum()
            )
            eps = runtime_zero_probe(sk[:, cols // 2], sv[:, cols // 2])
            newk = ck ^ (probe & jnp.uint32(1))
            return (newk, cv + eps), eps

        (_, _), outs = jax.lax.scan(body, (keys, vals), None, length=k)
        return outs

    return run


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    for rows, cols, tag in ((352, 131072, "scircuit-shape"),
                            (1664, 32768, "femirr-shape")):
        n = rows * cols
        keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        vals = jnp.asarray(rng.random(n, dtype=np.float32))

        def vary(i):
            return keys ^ jnp.uint32(i + 1), vals

        for stable, nops in ((True, 2), (False, 2), (False, 3)):
            fac = lambda k, s=stable, o=nops: make(rows, cols, s, o, k)
            r = bench_delta_stats(
                fac, vary, k1=8,
                name=f"{tag}_stable{stable}_ops{nops}")
            print(
                f"{tag:15s} rows={rows:5d} W={cols:6d} stable={stable!s:5s} "
                f"ops={nops}  {r.per_s*1e3:8.2f} ms "
                f"({r.per_s*1e9/n:5.2f} ns/elem) spread={r.spread:.3f} "
                f"k2={r.k2}",
                flush=True,
            )


if __name__ == "__main__":
    main()
