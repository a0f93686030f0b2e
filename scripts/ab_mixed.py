"""A/B mixed-mode expansion plans per matrix: the auto cost-model choice vs
pure-aligned and pure-narrow forced plans. Full spgemm_chunked pipeline,
K-scan + varied inputs (CLAUDE.md)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from benchmark_spgemm_using_csr_tpu import (
    CSR, make_chunked_plan, spgemm_chunked, spgemm_flops,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import bench, runtime_zero_probe

K_ITERS = 8


def time_plan(a, plan, label, flops):
    @jax.jit
    def run(a_c):
        def body(a_i, _):
            c = spgemm_chunked(a_i, a_i, plan)
            eps = runtime_zero_probe(
                c.rowptr, c.colidx, c.vals
            ).astype(a_i.vals.dtype)
            return (
                CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape),
                c.rowptr[-1],
            )
        _, outs = jax.lax.scan(body, a_c, None, length=K_ITERS)
        return outs

    vary = lambda i: (
        CSR(a.rowptr, a.colidx, a.vals + jnp.float32(1e-6) * i, a.shape),
    )
    r = bench(run, name=label, warmup=1, runs=3, flops=flops * K_ITERS,
              vary=vary)
    s = r.mean_s / K_ITERS
    print(f"  {label:28s} (al={plan.al} al_min={plan.al_min} k={plan.k} "
          f"set={int(plan.scatter_set)}): {s*1e3:8.2f} ms  "
          f"{flops/s/1e9:6.3f} GFlops")
    return s


for name in sys.argv[1:] or ("powerlaw_medium", "er_medium", "circuit_64k"):
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    flops = spgemm_flops(a, a)
    print(name)
    variants = {
        "auto": make_chunked_plan(a, a),
        "pure-al8": make_chunked_plan(a, a, al=8),
        "mixed-al8-min5": make_chunked_plan(a, a, al=8, al_min=5),
        "mixed-al8-min9": make_chunked_plan(a, a, al=8, al_min=9),
        "narrow-k1": make_chunked_plan(a, a, k=1),
    }
    seen = set()
    for label, plan in variants.items():
        if plan in seen:
            print(f"  {label:28s} == earlier variant, skipped")
            continue
        seen.add(plan)
        time_plan(a, plan, label, flops)
