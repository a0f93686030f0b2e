"""Measured A/B for VERDICT r3 next #1 (per-row-regime split): run the most
model-favorable split of circuit_64k (T=64 products/row: heavy rows carry
90% of products) as TWO grouped sub-products on-chip and compare

    t_body + t_heavy  (+ modeled assembly >= one nnz_c stream pass)
vs  t_unsplit

The model sweep (scripts/sweep_hybrid_split.py) says every split loses on
every heavy-tail suite matrix because (a) grouped's product-balanced groups
make its marginal cost partition-independent, and (b) nnz_c ~= products on
these matrices, so reassembling interleaved C rows costs >= one full-output
pass. This script turns (a) into a measurement; results land in
results.jsonl as ab_split_circuit rows.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops.grouped import (
    make_grouped_plan, spgemm_grouped,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal, spgemm_reference,
)
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats, runtime_zero_probe,
)
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu import spgemm_flops

K = 8
T = 64

a_sp = generators.SUITE["circuit_64k"]().tocsr()
m = a_sp.shape[0]
row_lens = np.diff(a_sp.indptr)
prod = np.zeros(m, np.int64)
np.add.at(prod, np.repeat(np.arange(m), row_lens), row_lens[a_sp.indices])
heavy = prod > T
print(f"split T={T}: heavy rows {int(heavy.sum())} carry "
      f"{prod[heavy].sum() / prod.sum():.0%} of products", flush=True)

b = CSR.from_scipy(a_sp)
parts = {
    "body": CSR.from_scipy(a_sp[np.arange(m)[~heavy]].tocsr()),
    "heavy": CSR.from_scipy(a_sp[np.arange(m)[heavy]].tocsr()),
    "unsplit": b,
}


def k_loop(x, sched, k=K):
    @jax.jit
    def run(a_c):
        def body_fn(a_i, _):
            c = spgemm_grouped(a_i, b, sched)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(
                a_i.vals.dtype
            )
            return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape), \
                c.rowptr[-1]
        _, outs = jax.lax.scan(body_fn, a_c, None, length=k)
        return outs

    return run


times = {}
for part, x in parts.items():
    sched = make_grouped_plan(x, b)
    assert sched is not None, part
    # correctness probe (also the compile)
    c = spgemm_grouped(x, b, sched)
    assert_csr_equal(c, spgemm_reference(x, b), rtol=1e-3, atol=1e-3)
    flops = spgemm_flops(x, b)
    dres = bench_delta_stats(
        lambda k=K: k_loop(x, sched, k),
        lambda i, x=x: (CSR(x.rowptr, x.colidx,
                            x.vals + jnp.asarray(1e-6 * i, x.vals.dtype),
                            x.shape),),
        k1=K, name=f"split_{part}", flops=flops,
    )
    times[part] = dres.per_s
    print(f"   {part}: {dres.per_s*1e3:.1f} ms (spread {dres.spread:.1%})",
          flush=True)
    write_result(
        "results.jsonl",
        {"matrix": "circuit_64k", "config": f"ab_split_circuit {part} T={T}",
         "device_s": dres.per_s, "flops": flops},
    )

nnz_c = int((spgemm_reference(b, b)).rowptr[-1]) if False else None
pat = a_sp.astype(bool)
nnz_c = int((pat @ pat).nnz)
asm_model_s = nnz_c * 2e-9 + nnz_c / 8 / 2.28e8
split_total = times["body"] + times["heavy"] + asm_model_s
print(f"SPLIT total {split_total*1e3:.1f} ms "
      f"(body {times['body']*1e3:.1f} + heavy {times['heavy']*1e3:.1f} + "
      f"assembly model {asm_model_s*1e3:.1f}) "
      f"vs UNSPLIT {times['unsplit']*1e3:.1f} ms -> "
      f"{'split wins' if split_total < times['unsplit'] else 'single-method optimal'}",
      flush=True)
write_result(
    "results.jsonl",
    {"matrix": "circuit_64k", "config": "ab_split_circuit verdict",
     "split_total_s": split_total, "unsplit_s": times["unsplit"],
     "assembly_model_s": asm_model_s, "nnz_c": nnz_c},
)
