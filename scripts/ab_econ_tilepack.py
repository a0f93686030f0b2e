"""On-chip A/B: econ_206k (mac_econ analogue) chunked vs tilepack.

Motivation (2026-08-19 bench): econ_206k measured 17 ns/product on the
al=8 chunked path vs er_medium's 6.5 — m=206500 misses the u32 single-key
pack (18+18 bits), so the global sort runs 3-operand/2-key. tilepack's
per-tile keys are (local_row, col) int32 regardless of m, so it dodges the
pack cliff entirely. If tilepack wins, estimate_chunked_s grows a
pack-regime term so the dispatcher learns the cliff.

Uses the honest K-scan delta methodology (utils/timing.bench_delta).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan, spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
    make_tilepack_plan, spgemm_tilepack,
)
from benchmark_spgemm_using_csr_tpu.ops.dispatch import (
    estimate_chunked_s, estimate_tilepack_s,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta, runtime_zero_probe,
)


def k_loop(fn, a, k):
    @jax.jit
    def run(a_in):
        def body(a_c, _):
            c = fn(a_c)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(
                a_c.vals.dtype
            )
            return CSR(a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape), \
                c.rowptr[-1]
        _, outs = jax.lax.scan(body, a_in, None, length=k)
        return outs
    return run


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "econ_206k"
    a = CSR.from_scipy(generators.SUITE[name]())
    from benchmark_spgemm_using_csr_tpu import spgemm_flops

    flops = spgemm_flops(a, a)
    print(f"{name}: est chunked {estimate_chunked_s(a)*1e3:.1f} ms, "
          f"est tilepack {estimate_tilepack_s(a)*1e3:.1f} ms")

    plan = make_chunked_plan(a, a)
    vary = lambda i: (CSR(a.rowptr, a.colidx,
                          a.vals + jnp.asarray(1e-6 * i, a.vals.dtype),
                          a.shape),)
    t_c, _ = bench_delta(
        lambda k=8: k_loop(lambda x: spgemm_chunked(x, x, plan), a, k),
        vary, k1=8, name=f"{name}-chunked", flops=flops,
    )
    print(f"chunked: {t_c*1e3:.1f} ms  {flops/t_c/1e9:.3f} GFlops "
          f"({t_c/ (flops/2) * 1e9:.1f} ns/product)")

    sched = make_tilepack_plan(a, a)
    if sched is None:
        print("tilepack: not applicable")
        return
    t_t, _ = bench_delta(
        lambda k=8: k_loop(lambda x: spgemm_tilepack(x, x, sched), a, k),
        vary, k1=8, name=f"{name}-tilepack", flops=flops,
    )
    print(f"tilepack: {t_t*1e3:.1f} ms  {flops/t_t/1e9:.3f} GFlops "
          f"(w={sched.plan.w}, t_cap={sched.plan.t_cap})")
    print(f"winner: {'tilepack' if t_t < t_c else 'chunked'} "
          f"({min(t_t, t_c)/max(t_t, t_c):.2f}x)")


if __name__ == "__main__":
    main()
