"""On-chip A/B for dense_rows_2k (VERDICT r3 weak #3 / next #2): the
dispatcher picks bsr (est 2.3 ms) over dense (est 4.4 ms) — record the
MEASURED times of both so the choice is validated, not modeled.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu.sparse.csr import BSR, CSR
from benchmark_spgemm_using_csr_tpu.ops.bsr import bsr_spgemm, make_bsr_plan
from benchmark_spgemm_using_csr_tpu.ops.dense import (
    make_dense_plan, spgemm_dense,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats, runtime_zero_probe,
)
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu import spgemm_flops

K = 8
a_sp = generators.SUITE["dense_rows_2k"]()
a = CSR.from_scipy(a_sp)
flops = spgemm_flops(a, a)

# --- bsr (the dispatcher's pick) ---
a_b = BSR.from_scipy(a_sp, block_shape=(8, 128))
b_b = BSR.from_scipy(a_sp, block_shape=(128, 128))
bplan = make_bsr_plan(a_b, b_b)


def k_loop_bsr(k=K):
    @jax.jit
    def run(blocks):
        def body(bl, _):
            a_i = BSR(a_b.rowptr, a_b.colidx, bl, a_b.shape)
            c = bsr_spgemm(a_i, b_b, bplan)
            eps = runtime_zero_probe(c.blocks.reshape(-1)).astype(bl.dtype)
            return bl + eps, c.blocks[0, 0, 0]
        _, outs = jax.lax.scan(body, blocks, None, length=k)
        return outs
    return run


d1 = bench_delta_stats(
    k_loop_bsr, lambda i: (a_b.blocks + jnp.float32(1e-6) * i,),
    k1=K, name="d2k_bsr", flops=flops,
)

# --- dense (the runner-up) ---
dplan = make_dense_plan(a, a)


def k_loop_dense(k=K):
    @jax.jit
    def run(a_c, plan):
        def body(ac, _):
            c = spgemm_dense(ac, ac, plan)
            eps = runtime_zero_probe(c.vals).astype(ac.vals.dtype)
            return CSR(ac.rowptr, ac.colidx, ac.vals + eps, ac.shape), \
                c.vals[0]
        _, outs = jax.lax.scan(body, a_c, None, length=k)
        return outs
    return lambda a_c: run(a_c, dplan)


d2 = bench_delta_stats(
    k_loop_dense,
    lambda i: (CSR(a.rowptr, a.colidx,
                   a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape),),
    k1=K, name="d2k_dense", flops=flops,
)
print(f"dense_rows_2k: bsr {d1.per_s*1e3:.3f} ms ({flops/d1.per_s/1e9:.1f} GF)"
      f" vs dense {d2.per_s*1e3:.3f} ms ({flops/d2.per_s/1e9:.1f} GF) -> "
      f"{'bsr' if d1.per_s < d2.per_s else 'dense'} confirmed")
write_result(
    "results.jsonl",
    {"matrix": "dense_rows_2k", "config": "ab_dense2k bsr-vs-dense",
     "bsr_s": d1.per_s, "dense_s": d2.per_s, "flops": flops,
     "winner": "bsr" if d1.per_s < d2.per_s else "dense"},
)
