"""A/B packed-tile ESC vs chunked on-chip. K-scan + varied inputs."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from benchmark_spgemm_using_csr_tpu import (
    CSR, make_chunked_plan, spgemm_chunked, spgemm_flops,
)
from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
    make_tilepack_plan, spgemm_tilepack,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import bench, runtime_zero_probe

K_ITERS = 8


def time_fn(a, spgemm, label, flops):
    @jax.jit
    def run(a_c):
        def body(a_i, _):
            c = spgemm(a_i, a_i)
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
    print(f"  {label:24s}: {s*1e3:8.2f} ms  {flops/s/1e9:6.3f} GFlops")
    return s


for name in sys.argv[1:] or ("er_medium",):
    a_sp = generators.SUITE[name]()
    a = CSR.from_scipy(a_sp)
    flops = spgemm_flops(a, a)
    print(name)
    cplan = make_chunked_plan(a, a)
    time_fn(a, lambda x, y: spgemm_chunked(x, y, cplan), "chunked-auto", flops)
    for w in (None, 512, 1024, 2048):
        sched = make_tilepack_plan(a, a, w=w)
        if sched is None:
            print(f"  tilepack w={w}: not applicable")
            continue
        print(f"  [plan w={sched.plan.w} t_cap={sched.plan.t_cap} "
              f"stream={sched.plan.t_cap*sched.plan.w/1e6:.1f}M "
              f"disp_bits={sched.plan.disp_bits} "
              f"set={int(sched.plan.scatter_set)}]")
        time_fn(
            a, lambda x, y, s=sched: spgemm_tilepack(x, y, s),
            f"tilepack-w{sched.plan.w}", flops,
        )
