"""A/B the aligned-expansion width per matrix: al in {0 (narrow), 2, 8}.
Full spgemm_chunked pipeline, K-scan + varied inputs (CLAUDE.md)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan, spgemm_chunked, spgemm_flops
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import bench, runtime_zero_probe

K_ITERS = 8

def time_al(a_sp, al, flops):
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a, al=(al or None)) if al else \
           make_chunked_plan(a, a, k=None, al=None)
    if al == 0:
        # force narrow: rebuild with explicit k from a narrow-only model
        import numpy as np
        from benchmark_spgemm_using_csr_tpu.ops import chunked as ch
        nnz_a = int(np.asarray(a.rowptr)[-1])
        b_len = np.diff(np.asarray(a.rowptr))
        lens = b_len[np.asarray(a.colidx)[:nnz_a]]
        cands = sorted({1, 2} | {int(np.clip(round(max(lens.mean(),1) * f), 4, 256)) for f in (0.5, 1.0, 2.0)})
        costs = [9.4 * int(np.ceil(lens / c).sum()) * c + int(np.ceil(lens / c).sum()) for c in cands]
        kbest = cands[int(np.argmin(costs))]
        plan = make_chunked_plan(a, a, k=kbest)
    @jax.jit
    def run(a_c):
        def body(a_i, _):
            c = spgemm_chunked(a_i, a_i, plan)
            eps = runtime_zero_probe(c.rowptr, c.colidx, c.vals).astype(a_i.vals.dtype)
            return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape), c.rowptr[-1]
        _, outs = jax.lax.scan(body, a_c, None, length=K_ITERS)
        return outs
    vary = lambda i: (CSR(a.rowptr, a.colidx, a.vals + jnp.float32(1e-6) * i, a.shape),)
    r = bench(run, name=f"al={al}", warmup=1, runs=3, flops=flops * K_ITERS, vary=vary)
    s = r.mean_s / K_ITERS
    print(f"  al={al} (plan.al={plan.al} k={plan.k}): {s*1e3:8.2f} ms  {flops/s/1e9:6.3f} GFlops")
    return s

for name in sys.argv[1:] or ("powerlaw_medium", "er_medium", "circuit_64k"):
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    flops = spgemm_flops(a, a)
    print(name)
    for al in (0, 2, 8):
        time_al(a_sp, al, flops)
