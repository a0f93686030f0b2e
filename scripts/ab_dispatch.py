"""A/B the dispatch-contested matrices on-chip: banded_16k (dia vs bsr)
and dense_rows_2k (dense vs bsr). Same two-length K-scan delta methodology
as bench.py (utils/timing.bench_delta) — the ~26 ms axon dispatch constant
cancels, so these calibrate the cost model's TRUE per-body terms."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

K_ITERS = 8


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from benchmark_spgemm_using_csr_tpu import BSR, CSR, DIA, spgemm_flops
    from benchmark_spgemm_using_csr_tpu.ops.bsr import bsr_spgemm, make_bsr_plan
    from benchmark_spgemm_using_csr_tpu.ops.dia import dia_spgemm
    from benchmark_spgemm_using_csr_tpu.ops.dense import make_dense_plan, spgemm_dense
    from benchmark_spgemm_using_csr_tpu.utils import generators
    from benchmark_spgemm_using_csr_tpu.utils.timing import bench_delta, runtime_zero_probe

    def time_bsr(a_sp, flops):
        a_b = BSR.from_scipy(a_sp, block_shape=(8, 128))
        b_b = BSR.from_scipy(a_sp, block_shape=(128, 128))
        bplan = make_bsr_plan(a_b, b_b)

        def kfac(k):
            @jax.jit
            def run(a_blocks):
                def body(blocks, _):
                    a_i = BSR(a_b.rowptr, a_b.colidx, blocks, a_b.shape)
                    c = bsr_spgemm(a_i, b_b, bplan)
                    eps = runtime_zero_probe(
                        c.rowptr, c.colidx, c.blocks.reshape(-1)
                    ).astype(blocks.dtype)
                    return blocks + eps, c.rowptr[-1]
                _, outs = jax.lax.scan(body, a_blocks, None, length=k)
                return outs
            return run

        vary = lambda i: (a_b.blocks + jnp.float32(1e-6) * i,)
        s, _ = bench_delta(kfac, vary, k1=K_ITERS, name="bsr", flops=flops)
        return s

    def time_dia(a_sp, flops):
        a_d = DIA.from_scipy(a_sp)

        def kfac(k):
            @jax.jit
            def run(plane0):
                def body(plane, _):
                    a_i = DIA(plane, a_d.offsets, a_d.shape)
                    c = dia_spgemm(a_i, a_i)
                    eps = runtime_zero_probe(c.data.reshape(-1)).astype(plane.dtype)
                    return plane + eps, c.data[0, 0]
                _, outs = jax.lax.scan(body, plane0, None, length=k)
                return outs
            return run

        vary = lambda i: (a_d.data + jnp.float32(1e-6) * i,)
        s, _ = bench_delta(kfac, vary, k1=K_ITERS, name="dia", flops=flops)
        return s

    def time_dense(a_sp, flops):
        a = CSR.from_scipy(a_sp)
        dplan = make_dense_plan(a, a)

        def kfac(k):
            @jax.jit
            def run(a_c):
                def body(a_i, _):
                    c = spgemm_dense(a_i, a_i, dplan)
                    eps = runtime_zero_probe(c.vals).astype(a_i.vals.dtype)
                    return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape), c.vals[0]
                _, outs = jax.lax.scan(body, a_c, None, length=k)
                return outs
            return run

        vary = lambda i: (
            CSR(a.rowptr, a.colidx, a.vals + jnp.float32(1e-6) * i, a.shape),
        )
        s, _ = bench_delta(kfac, vary, k1=K_ITERS, name="dense", flops=flops)
        return s

    for name, methods in [
        ("banded_16k", ("dia", "bsr")),
        ("dense_rows_2k", ("dense", "bsr")),
        ("poisson2d_256", ("dia", "bsr")),
    ]:
        a_sp = generators.SUITE[name]()
        a = CSR.from_scipy(a_sp)
        flops = spgemm_flops(a, a)
        timers = {"bsr": time_bsr, "dia": time_dia, "dense": time_dense}
        for m in methods:
            s = timers[m](a_sp, flops)
            print(f"{name:16s} {m:6s} {s*1e3:8.3f} ms  {flops/s/1e9:7.3f} GFlops")


if __name__ == "__main__":
    main()
