"""Interleaved A/B: BSR/MXU vs chunked on poisson2d_256 — the 2% block
density dispatch threshold was calibrated with the DCE-tainted probe, when
chunked appeared ~3x faster than it honestly is.
    python scripts/ab_bsr_poisson.py [matrix]
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

from benchmark_spgemm_using_csr_tpu import BSR, CSR, make_chunked_plan, spgemm_chunked
from benchmark_spgemm_using_csr_tpu.ops.bsr import bsr_spgemm, make_bsr_plan
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

K = 8


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "poisson2d_256"
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    print("backend:", jax.devices())

    plan = make_chunked_plan(a, a)

    a_b = BSR.from_scipy(a_sp, block_shape=(8, 128))
    b_b = BSR.from_scipy(a_sp, block_shape=(128, 128))
    bplan = make_bsr_plan(a_b, b_b)
    occ = a_b.blocks.shape[0] / max(
        (a.m // 8) * (a.n // 128), 1
    )
    print(f"A 8x128 occupied-block fraction: {occ*100:.2f}%  "
          f"blocks={a_b.blocks.shape}")

    @jax.jit
    def run_chunked(a_c):
        def body(a_i, _):
            c = spgemm_chunked(a_i, a_i, plan)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(
                a_i.vals.dtype
            )
            return (
                CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape),
                c.rowptr[-1],
            )

        _, outs = jax.lax.scan(body, a_c, None, length=K)
        return outs

    @jax.jit
    def run_bsr(blocks):
        def body(blk, _):
            a_i = BSR(a_b.rowptr, a_b.colidx, blk, a_b.shape)
            c = bsr_spgemm(a_i, b_b, bplan)
            eps = runtime_zero_probe(
                c.rowptr, c.colidx, c.blocks.reshape(-1)
            ).astype(blk.dtype)
            return blk + eps, c.rowptr[-1]

        _, outs = jax.lax.scan(body, a_b.blocks, None, length=K)
        return outs

    def nudge_csr(i):
        out = CSR(a.rowptr, a.colidx,
                  a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
        return jax.block_until_ready(out)

    def nudge_blocks(i):
        return jax.block_until_ready(a_b.blocks + jnp.float32(1e-6) * i)

    runs = {
        "chunked": (run_chunked, nudge_csr),
        "bsr": (run_bsr, nudge_blocks),
    }
    idx = 0
    for fn, nd in runs.values():
        jax.block_until_ready(fn(nd(idx)))
        idx += 1
    times = {k_: [] for k_ in runs}
    for rep in range(4):
        for label, (fn, nd) in runs.items():
            arg = nd(idx)
            idx += 1
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            times[label].append((time.perf_counter() - t0) / K)
    print(f"\n=== {name} ===")
    for label, ts in times.items():
        print(f"{label:8s}: min {min(ts)*1e3:8.2f} ms  "
              f"all {[round(t*1e3,1) for t in ts]}")


if __name__ == "__main__":
    main()
