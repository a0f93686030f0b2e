"""Does Mosaic support fast vectorized gathers from a VMEM-resident table?

If a Pallas kernel can gather ~100M+ elem/s from VMEM, the SpGEMM expansion
could stage B (or B windows) in VMEM and beat XLA's HBM gather
(~100-240 M desc/s). Measured here: table of 64k int32 pairs in VMEM,
1M random indices per grid block.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def t(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    TBL = 1 << 16
    N = 1 << 20
    BLOCK = 1 << 14

    tbl = jnp.asarray(rng.standard_normal(TBL).astype(np.float32))
    # 2D table (Mosaic prefers >=2D); lanes = 128
    tbl2 = tbl.reshape(TBL // 128, 128)
    idx = jnp.asarray(rng.integers(0, TBL, N).astype(np.int32)).reshape(N // 128, 128)

    def kernel(tbl_ref, idx_ref, out_ref):
        ix = idx_ref[...]
        r = ix // 128
        c = ix % 128
        out_ref[...] = tbl_ref[r, c]

    @jax.jit
    def run(tbl2, idx):
        return pl.pallas_call(
            kernel,
            grid=(N // 128 // (BLOCK // 128),),
            in_specs=[
                pl.BlockSpec((TBL // 128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        )(tbl2, idx)

    try:
        out = run(tbl2, idx)
        want = np.asarray(tbl)[np.asarray(idx).ravel()].reshape(out.shape)
        ok = np.allclose(np.asarray(out), want)
        dt = t(run, tbl2, idx)
        print(f"pallas VMEM gather 1M: {dt*1e3:8.2f} ms ({N/dt/1e6:.0f} M/s) correct={ok}")
    except Exception as e:
        print(f"pallas VMEM gather FAILED: {type(e).__name__}: {str(e)[:400]}")

    # XLA HBM gather baseline, same volume
    flat_idx = idx.reshape(-1)
    xla = jax.jit(lambda tb, ix: tb[ix])
    dt = t(xla, tbl, flat_idx)
    print(f"xla gather 1M        : {dt*1e3:8.2f} ms ({N/dt/1e6:.0f} M/s)")


if __name__ == "__main__":
    main()
