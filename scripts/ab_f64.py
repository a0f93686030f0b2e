"""On-chip f64 probes (VERDICT r3 next #3): what does emulated FP64 cost
per path on the v5e?

- DIA plane FMAs: f64 multiply-adds under x64 (XLA emulation) vs f32.
- Dense MXU: f64 matmul under x64 (XLA lowers to ??? — measure) vs
  f32-HIGHEST, on the dense_rows_2k shape.
- grouped dd lane already measured (er_small_f64, bench.py).

Each timed with the two-length K-scan delta; correctness vs x64 scipy at
rtol 1e-12 asserted before timing. Run alone.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.sparse.dia import DIA
from benchmark_spgemm_using_csr_tpu.ops.dia import dia_spgemm
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats, runtime_zero_probe,
)
from benchmark_spgemm_using_csr_tpu import spgemm_flops

K = 8


def k_loop_dia(a_d, k=K):
    @jax.jit
    def run(a_plane):
        def body(plane, _):
            a_i = DIA(plane, a_d.offsets, a_d.shape)
            c = dia_spgemm(a_i, a_i)
            eps = runtime_zero_probe(c.data.reshape(-1)).astype(plane.dtype)
            return plane + eps, c.data[0, 0]
        _, outs = jax.lax.scan(body, a_plane, None, length=k)
        return outs

    return run


# ---- DIA f64: poisson2d_256 ----
for name in ("poisson2d_256", "fem_17k"):
    a_sp = generators.SUITE[name]().astype(np.float64)
    rng = np.random.default_rng(0)
    a_sp.data = a_sp.data * (1.0 + 1e-8 * rng.standard_normal(a_sp.nnz))
    a64 = CSR.from_scipy(a_sp, dtype=jnp.float64)
    flops = spgemm_flops(a64, a64)
    a_d = DIA.from_scipy(a_sp)
    assert a_d.data.dtype == jnp.float64, a_d.data.dtype
    c_d = jax.block_until_ready(dia_spgemm(a_d, a_d))
    csp = c_d.to_scipy().tocsr(); csp.eliminate_zeros()
    want = (a_sp @ a_sp).tocsr(); want.sort_indices(); want.eliminate_zeros()
    assert csp.nnz == want.nnz, (csp.nnz, want.nnz)
    # TPU f64 is double-double-emulated (~2^-48/op): cancellation-tiny
    # entries carry absolute error ~ n_terms * 2^-48 * |terms| (measured
    # max 9e-14 on fem_17k's 73-term rows), so pair rtol with a matching
    # atol instead of pretending pure-relative 1e-12 holds at any scale.
    np.testing.assert_allclose(csp.data, want.data, rtol=1e-12, atol=1e-12)
    dres = bench_delta_stats(
        lambda k=K: k_loop_dia(a_d, k),
        lambda i: (a_d.data + jnp.float64(1e-9) * i,),
        k1=K, name=f"{name}_f64", flops=flops,
    )
    print(f"{name}_f64 (dia): {dres.per_s*1e3:.3f} ms -> "
          f"{flops/dres.per_s/1e9:.2f} GF  spread {dres.spread:.1%}",
          flush=True)

# ---- dense MXU f64: raw matmul probe at 2048^3 ----
for dt, prec in ((jnp.float32, jax.lax.Precision.HIGHEST),
                 (jnp.float64, None)):
    n = 2048
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)), dt)

    def kfac(k=K, x=x, prec=prec):
        @jax.jit
        def run(x):
            def body(xc, _):
                y = jnp.matmul(xc, xc, precision=prec)
                eps = runtime_zero_probe(y).astype(xc.dtype)
                return xc + eps, y[0, 0]
            _, outs = jax.lax.scan(body, x, None, length=k)
            return outs
        return run

    fl = 2 * n ** 3
    dres = bench_delta_stats(
        kfac, lambda i: (x + jnp.asarray(1e-9 * i, dt),),
        k1=K, name=f"matmul2048_{dt.__name__}", flops=fl,
    )
    print(f"matmul 2048^3 {dt.__name__}: {dres.per_s*1e3:.3f} ms -> "
          f"{fl/dres.per_s/1e12:.2f} TF/s  spread {dres.spread:.1%}",
          flush=True)
