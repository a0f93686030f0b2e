"""Block-size sweep for the PRODUCTION fused scan tail
(ops/scancompact.runsum_compact_scan) on a scircuit-shaped stream.

The default block=65536 was chosen without a sweep (round 3); at scircuit
scale the tail is ~68 ms — tied with the 2D sort as the largest stage
(BASELINE.md round-4 stage profile). Block size trades scan iteration
count (nb = S/B, each paying scan-carry + dynamic_update_slice overhead)
against per-block pass count (log2(B) cumsum + log2(B) local-compact
shifts over 4 operands).

Run on the real chip:
    python scripts/micro_scanblock.py [S_mega] [B1,B2,...]
Defaults: S=46M (scircuit prod_cap), blocks 16384..262144.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.ops.scancompact import (
    SENTINEL_U32,
    runsum_compact_scan,
)
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta,
    runtime_zero_probe,
)


def make_stream(s_total, w, dup=0.03, pad=0.15, seed=0):
    """Sorted grouped (key, val) stream with sentinel tails per group
    (same generator as scripts/micro_scancompact.py)."""
    rng = np.random.default_rng(seed)
    g = s_total // w
    keys = np.full((g, w), SENTINEL_U32, np.uint32)
    fill = int(w * (1 - pad))
    base = rng.integers(0, 1 << 28, size=(g, fill), dtype=np.uint32)
    base = np.sort(base, axis=1)
    ndup = int(fill * dup)
    idx = rng.integers(1, fill, size=(g, ndup))
    # vectorized across ALL groups (advisor r4: the old min(g, 64) loop
    # left ~83% of a 48M-slot stream's groups duplicate-free, under-
    # representing run-sum/merge cost in a 'scircuit-shaped' stream)
    rows = np.arange(g)[:, None]
    base[rows, idx] = base[rows, idx - 1]
    keys[:, :fill] = np.sort(base, axis=1)
    vals = rng.standard_normal((g, w)).astype(np.float32)
    return jnp.asarray(keys.reshape(-1)), jnp.asarray(vals.reshape(-1)), g


def main():
    s_mega = int(sys.argv[1]) if len(sys.argv) > 1 else 46
    blocks = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [16384, 32768, 65536, 131072, 262144]
    )
    w = 131072
    s = (s_mega << 20) // w * w
    okey, oval, g = make_stream(s, w)
    out_cap = s
    max_run = 4096
    print(f"S={s/1e6:.1f}M groups={g} W={w} blocks={blocks}", flush=True)

    # independent numpy oracle on a 4-group slice (advisor r4: checking
    # block sizes against each other would pass a bug common to the
    # shared scan body; tests/test_scancompact_fusion.py does the same
    # for the fusion regression)
    ks4 = np.asarray(okey[: 4 * w]).reshape(4, w)
    vs4 = np.asarray(oval[: 4 * w]).reshape(4, w)
    exp_k, exp_v, kept_all = [], [], []
    for gi in range(4):
        k, v = ks4[gi], vs4[gi].astype(np.float64)
        last = np.empty(w, bool)
        last[:-1] = k[:-1] != k[1:]
        last[-1] = True
        kept = last & (k != SENTINEL_U32)
        new = np.empty(w, bool)
        new[0] = True
        new[1:] = ~(~last)[:-1]
        rid = np.cumsum(new) - 1
        sums = np.bincount(rid, weights=v)
        exp_k.append(k[kept])
        exp_v.append(sums[rid[kept]])
        kept_all.append(kept)
    exp_k = np.concatenate(exp_k)
    exp_v = np.concatenate(exp_v)
    exp_t = np.cumsum(np.concatenate(kept_all))
    for b in blocks:
        kc, vc, tc = runsum_compact_scan(
            okey[: 4 * w], oval[: 4 * w], w=w, out_cap=4 * w,
            max_run=max_run, block=b,
        )
        n = int(np.asarray(tc)[-1])
        assert n == exp_k.shape[0], (b, n, exp_k.shape[0])
        np.testing.assert_array_equal(np.asarray(kc)[:n], exp_k)
        np.testing.assert_allclose(
            np.asarray(vc)[:n], exp_v, rtol=2e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(tc), exp_t)
    print("oracle correctness OK (numpy, 4-group slice)", flush=True)

    results = {}
    for b in blocks:
        def kfac(kk, b=b):
            @jax.jit
            def run(key, val):
                def bd(c, _):
                    key_c, val_c = c
                    eps = runtime_zero_probe(
                        *runsum_compact_scan(
                            key_c, val_c, w=w, out_cap=out_cap,
                            max_run=max_run, block=b,
                        )
                    )
                    return (key_c, val_c + eps), eps
                _, outs = jax.lax.scan(bd, (key, val), None, length=kk)
                return outs
            return run

        per, k2 = bench_delta(
            kfac, lambda i: (okey, oval + jnp.float32(1e-6 * i)),
            k1=4, name=f"B={b}", runs=2,
        )
        results[b] = per
        print(
            f"B={b:7d}: {per*1e3:.2f} ms  ({per/s*1e9:.3f} ns/slot,"
            f" k2={k2})",
            flush=True,
        )
    best = min(results, key=results.get)
    print(
        f"best B={best} at {results[best]*1e3:.2f} ms"
        f" (default 65536: {results.get(65536, float('nan'))*1e3:.2f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
