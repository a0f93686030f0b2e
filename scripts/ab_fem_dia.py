"""On-chip A/B: DIA gather-form vs the dispatcher's grouped choice on the
FEM-irregular band (VERDICT r3 weak #1/#2, next #1/#2).

Host analysis (scripts/analyze_weak.py) shows the fem/pdb generators have
only ~135 distinct scalar diagonals (27 node offsets x 5 dof sub-diagonals)
— a DIA regime blocked ONLY by estimate_dia_s's nd_a*nd_b <= 8192 compile
guard. This script measures the real compile wall + K-scan device time of
the 135^2-term gather form per matrix, verifies vs scipy, and prints the
would-be dispatch decision.

Run alone (one CPU core: compiles serialize with anything else).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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


# grouped round-3 measured device times (results.jsonl, medians)
GROUPED_MS = {"fem_17k": 194.0, "fem_32k": 405.0, "pdb_8k": 176.0}

for name in ("pdb_8k", "fem_17k", "fem_32k"):
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    flops = spgemm_flops(a, a)
    t0 = time.perf_counter()
    a_d = DIA.from_scipy(a_sp)
    t_conv = time.perf_counter() - t0
    nd = a_d.data.shape[0]
    terms = nd * nd
    print(f"== {name}: nd={nd} terms={terms} n={a_sp.shape[1]} "
          f"(DIA conv {t_conv:.1f}s)", flush=True)

    # correctness first (single dispatch; also the compile-wall probe)
    t0 = time.perf_counter()
    c_d = jax.block_until_ready(dia_spgemm(a_d, a_d))
    t_compile = time.perf_counter() - t0
    csp = c_d.to_scipy().tocsr()
    csp.eliminate_zeros()
    want = (a_sp @ a_sp).tocsr()
    want.sort_indices()
    want.eliminate_zeros()
    assert csp.nnz == want.nnz, (csp.nnz, want.nnz)
    np.testing.assert_allclose(csp.data, want.data, rtol=2e-3, atol=1e-3)
    print(f"   verified vs scipy (nnz_c={want.nnz}); "
          f"first-call wall {t_compile:.1f}s", flush=True)

    dres = bench_delta_stats(
        lambda k=K: k_loop_dia(a_d, k),
        lambda i: (a_d.data + jnp.float32(1e-6) * i,),
        k1=K, name=name, flops=flops,
    )
    gf = flops / dres.per_s / 1e9
    base = GROUPED_MS.get(name, float("nan"))
    print(f"   DIA device {dres.per_s*1e3:.2f} ms  -> {gf:.2f} GF "
          f"(grouped r3: {base:.0f} ms, speedup {base/(dres.per_s*1e3):.1f}x)"
          f"  spread {dres.spread:.1%} k2={dres.k2}", flush=True)
