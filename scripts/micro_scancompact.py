"""Micro A/B: fused scan-based runsum+compaction vs the production
_segmented_runsum + _shift_compact pair, on a synthetic sorted grouped
stream shaped like scircuit_256k's (S = 46M, W = 131072, ~3% duplicates,
~15% group-tail padding).

The shift-compact global pass count is bit_length(total holes) (~23); the
scan variant's per-block local compaction needs only log2(B) passes in the
(hopefully register-fused) scan body, with ragged appends via
dynamic_update_slice at a runtime offset. Run on the real chip:
    python scripts/micro_scancompact.py [S_mega] [B]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _segmented_runsum,
    _shift_compact,
)
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta,
    runtime_zero_probe,
)

SENT = np.uint32(0xFFFFFFFF)


def make_stream(s_total, w, dup=0.03, pad=0.15, seed=0):
    """Sorted grouped (key, val) stream with sentinel tails per group."""
    rng = np.random.default_rng(seed)
    g = s_total // w
    keys = np.full((g, w), SENT, np.uint32)
    fill = int(w * (1 - pad))
    base = rng.integers(0, 1 << 28, size=(g, fill), dtype=np.uint32)
    base = np.sort(base, axis=1)
    # inject duplicates: repeat ~dup of positions
    ndup = int(fill * dup)
    idx = rng.integers(1, fill, size=(g, ndup))
    for gi in range(min(g, 64)):  # cheap approximation on a few groups
        base[gi, idx[gi]] = base[gi, idx[gi] - 1]
    keys[:, :fill] = np.sort(base, axis=1)
    vals = rng.standard_normal((g, w)).astype(np.float32)
    return jnp.asarray(keys.reshape(-1)), jnp.asarray(vals.reshape(-1)), g


def old_path(okey, oval, w, disp_bits, max_run, out_cap):
    s = okey.shape[0]
    gid = (jnp.arange(s, dtype=jnp.int32) // w)
    run = _segmented_runsum(gid, okey.astype(jnp.int32), oval,
                            max_run=max_run)
    valid = okey != jnp.uint32(SENT)
    nxt_same = jnp.concatenate(
        [(okey[1:] == okey[:-1]) & (gid[1:] == gid[:-1]),
         jnp.zeros((1,), jnp.bool_)]
    )
    kept = valid & ~nxt_same
    tails_cum = jnp.cumsum(kept.astype(jnp.int32))
    disp = jnp.arange(s, dtype=jnp.int32) - (tails_cum - kept.astype(jnp.int32))
    keyc, valc = _shift_compact(
        kept, jnp.where(kept, disp, 0), [okey.astype(jnp.int32), run],
        disp_bits,
    )
    return keyc[:out_cap], valc[:out_cap], tails_cum


def _local_scan_pow2(flag, x, passes):
    """Segmented inclusive sum within a block: log passes. The flag shifts
    in TRUE (window clips at the block start — shifting False would cut
    the first elements' connectivity and drop the cross-block carry)."""
    f = flag
    for p in (1 << np.arange(passes)):
        xs = jnp.concatenate([jnp.zeros(p, x.dtype), x[:-p]])
        fs = jnp.concatenate([jnp.ones(p, jnp.bool_), f[:-p]])
        x = x + jnp.where(f, xs, 0)
        f = f & fs
    return x, f  # f = connected-to-block-start


def _local_cumsum(kept, passes):
    x = kept.astype(jnp.int32)
    for p in (1 << np.arange(passes)):
        x = x + jnp.concatenate([jnp.zeros(p, x.dtype), x[:-p]])
    return x  # inclusive


def scan_path(okey, oval, w, b, max_run, out_cap):
    """Sequential block scan: local runsum+tails+compact, ragged append."""
    s = okey.shape[0]
    nb = s // b
    lb = int(np.log2(b))
    rb = min(lb, max(int(max_run - 1).bit_length(), 1))
    k2 = okey.reshape(nb, b)
    v2 = oval.reshape(nb, b)
    firsts_next = jnp.concatenate(
        [k2[1:, 0], jnp.full((1,), SENT, jnp.uint32)]
    )
    # static per-block: does the block end on a group boundary?
    ends_group = jnp.asarray(
        [((i + 1) * b) % w == 0 for i in range(nb)], jnp.bool_
    )
    iota = jnp.arange(b, dtype=jnp.int32)

    def body(carry, xs):
        out_col, out_val, off, ckey, crun = carry
        k, v, fnext, endg, i = xs
        gid0_same = (iota == 0) & (k[0] == ckey) & ((i * b) % w != 0)
        same = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), (k[1:] == k[:-1])]
        ) | gid0_same
        # gid equality within block: keys of different groups can only be
        # "equal" across a group boundary inside the block; boundaries are
        # at slot multiples of w
        gb = ((i * b + iota) % w) == 0
        same = same & ~gb | gid0_same
        run, conn = _local_scan_pow2(same, v, rb)
        run = run + jnp.where(conn & (k == ckey), crun, 0.0)
        valid = k != jnp.uint32(SENT)
        nxt = jnp.concatenate(
            [(k[1:] == k[:-1]) & ~gb[1:], (k[B_LAST:] == fnext) & ~endg]
        )
        kept = valid & ~nxt
        csum = _local_cumsum(kept, lb)
        cnt = csum[-1]
        disp = iota - (csum - kept.astype(jnp.int32))
        colc, valc = _shift_compact(
            kept, jnp.where(kept, disp, 0),
            [k.astype(jnp.int32), run], lb,
        )
        out_col = jax.lax.dynamic_update_slice(out_col, colc, (off,))
        out_val = jax.lax.dynamic_update_slice(out_val, valc, (off,))
        tails = off + csum
        new = (out_col, out_val, off + cnt, k[-1], run[-1])
        return new, tails

    B_LAST = b - 1
    out_col0 = jnp.zeros(out_cap + b, jnp.int32)
    out_val0 = jnp.zeros(out_cap + b, jnp.float32)
    (out_col, out_val, total, _, _), tails = jax.lax.scan(
        body,
        (out_col0, out_val0, jnp.zeros((), jnp.int32),
         jnp.full((), SENT, jnp.uint32), jnp.zeros((), jnp.float32)),
        (k2, v2, firsts_next, ends_group,
         jnp.arange(nb, dtype=jnp.int32)),
    )
    return out_col[:out_cap], out_val[:out_cap], tails.reshape(-1)


def main():
    s_mega = int(sys.argv[1]) if len(sys.argv) > 1 else 46
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    w = 131072
    s = (s_mega << 20) // w * w
    okey, oval, g = make_stream(s, w)
    out_cap = s
    max_run = 4096
    disp_bits = 23
    print(f"S={s/1e6:.1f}M groups={g} W={w} B={b}", flush=True)

    if "--skip-check" not in sys.argv:
        # correctness cross-check on a small slice
        sk, sv = okey[: 4 * w], oval[: 4 * w]
        oc, ov, tc = old_path(sk, sv, w, disp_bits, max_run, 4 * w)
        nc, nv, ntc = scan_path(sk, sv, w, b, max_run, 4 * w)
        n_old = int(tc[-1])
        n_new = int(ntc[-1])
        assert n_old == n_new, (n_old, n_new)
        np.testing.assert_array_equal(
            np.asarray(oc)[:n_old], np.asarray(nc)[:n_old]
        )
        np.testing.assert_allclose(
            np.asarray(ov)[:n_old], np.asarray(nv)[:n_old], rtol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(tc), np.asarray(ntc))
        print("correctness OK", flush=True)

    for name, fn in (
        ("old", lambda k_, v_: runtime_zero_probe(
            *old_path(k_, v_, w, disp_bits, max_run, out_cap))),
        ("scan", lambda k_, v_: runtime_zero_probe(
            *scan_path(k_, v_, w, b, max_run, out_cap))),
    ):
        def kfac(kk, fn=fn):
            @jax.jit
            def run(key, val):
                def bd(c, _):
                    key_c, val_c = c
                    eps = fn(key_c, val_c)
                    return (key_c, val_c + eps), eps
                _, outs = jax.lax.scan(bd, (key, val), None, length=kk)
                return outs
            return run

        per, k2 = bench_delta(
            kfac, lambda i: (okey, oval + jnp.float32(1e-6 * i)),
            k1=4, name=name, runs=2,
        )
        print(f"{name}: {per*1e3:.2f} ms  ({per/s*1e9:.3f} ns/slot, k2={k2})",
              flush=True)


if __name__ == "__main__":
    main()
