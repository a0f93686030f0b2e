"""Best-backend A/B records for the round-4 suite points (VERDICT r3 #6
done-criterion): measure the runner-up backend (chunked) against the
dispatcher's grouped choice on each new point; one results.jsonl row each.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan, spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats, runtime_zero_probe,
)
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu import spgemm_flops

K = 8

# grouped numbers from the round-4 full bench (results.jsonl)
GROUPED_MS = {
    "femirr_17k": 194.0, "hubrows_32k": 84.2, "pattern_circuit_64k": 38.4,
    "rect_96k_24k_48k": 85.1,
}

CASES = {
    "femirr_17k": lambda: (generators.SUITE["femirr_17k"](), None),
    "hubrows_32k": lambda: (generators.SUITE["hubrows_32k"](), None),
    "pattern_circuit_64k": lambda: (
        generators.SUITE["pattern_circuit_64k"](), None
    ),
    "rect_96k_24k_48k": lambda: generators.SUITE_PAIRS["rect_96k_24k_48k"](),
}

for name, fac in CASES.items():
    a_sp, b_sp = fac()
    a = CSR.from_scipy(a_sp)
    b = a if b_sp is None else CSR.from_scipy(b_sp)
    flops = spgemm_flops(a, b)
    plan = make_chunked_plan(a, b)

    def kfac(k=K, plan=plan, b=b):
        @jax.jit
        def run(a_c):
            def body(a_i, _):
                c = spgemm_chunked(a_i, b, plan)
                eps = runtime_zero_probe(
                    c.rowptr, c.colidx, c.vals
                ).astype(a_i.vals.dtype)
                return CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps,
                           a_i.shape), c.rowptr[-1]
            _, outs = jax.lax.scan(body, a_c, None, length=k)
            return outs
        return run

    d = bench_delta_stats(
        kfac,
        lambda i: (CSR(a.rowptr, a.colidx,
                       a.vals + jnp.asarray(1e-6 * i, a.vals.dtype),
                       a.shape),),
        k1=K, name=f"ab_{name}_chunked", flops=flops,
    )
    g_ms = GROUPED_MS.get(name, float("nan"))
    print(f"{name}: chunked {d.per_s*1e3:.1f} ms vs grouped {g_ms:.1f} ms "
          f"-> {'grouped' if g_ms < d.per_s*1e3 else 'chunked'} best",
          flush=True)
    write_result(
        "results.jsonl",
        {"matrix": name, "config": "ab_newpoints chunked-vs-grouped",
         "chunked_s": d.per_s, "grouped_s": g_ms / 1e3,
         "best": "grouped" if g_ms < d.per_s * 1e3 else "chunked"},
    )
