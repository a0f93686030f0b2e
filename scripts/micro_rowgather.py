"""Can wide table rows cut gather cost per product below 1 descriptor?

The chunked expansion currently does an advanced-index gather with one
descriptor per PRODUCT (8 bytes each) — descriptor-rate-bound. If the B
table is reshaped to (cap/P, 2P) so each descriptor fetches P packed
(col,val) pairs, the descriptor count drops to ~ceil(K/P)+1 per CHUNK.
Measures: row-gather rate vs row width P, realignment select cost, and an
end-to-end (gather+realign) comparison against the per-element baseline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def t(fn, *args, n=5, warmup=2):
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
    cap = 1 << 20
    nchunks = 1 << 20
    K = 8

    tbl = jnp.asarray(rng.integers(0, 1 << 30, (cap, 2)).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, cap - 2 * K, nchunks).astype(np.int32))
    lane = jnp.arange(K, dtype=jnp.int32)

    # baseline: per-product advanced-index gather (current implementation)
    f0 = jax.jit(lambda p: tbl[p[:, None] + lane[None, :], :])
    dt = t(f0, pos)
    print(f"baseline adv-index K={K}      : {dt*1e3:8.2f} ms "
          f"({nchunks*K/dt/1e6:6.0f} M desc/s)")

    for P in (4, 8, 16, 32, 64):
        tblr = tbl.reshape(cap // P, 2 * P)
        nrows = cap // P
        rows_needed = (K + P - 1) // P + 1

        # a) aligned single-row gather (descriptor-rate probe)
        fa = jax.jit(lambda p, tblr=tblr, P=P: tblr[jnp.minimum(p // P, nrows - 1)])
        dt = t(fa, pos)
        print(f"P={P:3d} row gather x1          : {dt*1e3:8.2f} ms "
              f"({nchunks/dt/1e6:6.0f} M desc/s, {nchunks*8*P/dt/1e9:5.1f} GB/s)")

        # b) window: rows_needed rows + realign select -> (nchunks, K, 2)
        def fb(p, tblr=tblr, P=P, rows_needed=rows_needed):
            base = p // P
            off = p % P
            ridx = jnp.clip(
                base[:, None] + jnp.arange(rows_needed, dtype=jnp.int32)[None, :],
                0, nrows - 1,
            )
            raw = tblr[ridx]  # (nchunks, rows_needed, 2P)
            flat = raw.reshape(nchunks, rows_needed * P, 2)
            sel = flat[:, 0:K, :]
            off3 = off[:, None, None]
            for s in range(1, P):
                sel = jnp.where(off3 == s, flat[:, s:s + K, :], sel)
            return sel

        try:
            fbj = jax.jit(fb)
            out = fbj(pos)
            want = np.asarray(f0(pos))
            ok = np.array_equal(np.asarray(out), want)
            dt = t(fbj, pos)
            print(f"P={P:3d} window+select K={K}     : {dt*1e3:8.2f} ms "
                  f"({nchunks*rows_needed/dt/1e6:6.0f} M desc/s raw) correct={ok}")
        except Exception as e:
            print(f"P={P:3d} window+select FAILED: {type(e).__name__}: {str(e)[:200]}")

        # c) realign via take_along_axis instead of P-way select
        def fc(p, tblr=tblr, P=P, rows_needed=rows_needed):
            base = p // P
            off = p % P
            ridx = jnp.clip(
                base[:, None] + jnp.arange(rows_needed, dtype=jnp.int32)[None, :],
                0, nrows - 1,
            )
            raw = tblr[ridx].reshape(nchunks, rows_needed * P, 2)
            gidx = off[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            return jnp.take_along_axis(raw, gidx[:, :, None], axis=1)

        try:
            fcj = jax.jit(fc)
            out = fcj(pos)
            ok = np.array_equal(np.asarray(out), want)
            dt = t(fcj, pos)
            print(f"P={P:3d} window+take_along K={K}  : {dt*1e3:8.2f} ms correct={ok}")
        except Exception as e:
            print(f"P={P:3d} window+take_along FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
