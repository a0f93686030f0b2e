"""Throughput of the fused Pallas sort+compress kernel on (T, W) tiles vs
the global XLA sort it would replace, at the er_medium padded-stream scale
(~15M elements). K-scan methodology (CLAUDE.md)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from benchmark_spgemm_using_csr_tpu.utils.timing import bench, runtime_zero_probe
from benchmark_spgemm_using_csr_tpu.ops.pallas_kernels import bin_sort_compress

K_ITERS = 8
N = 15 * (1 << 20)  # ~15.7M
SENT = 1 << 26

rng = np.random.default_rng(0)


def time_tile(w):
    t = N // w
    col0 = jnp.asarray(rng.integers(0, SENT, (t, w), dtype=np.int32))
    val0 = jnp.asarray(rng.random((t, w), dtype=np.float32))

    @jax.jit
    def run(col):
        def body(c, _):
            oc, ov, pos, cnt = bin_sort_compress(c, val0, n_sentinel=SENT)
            eps = runtime_zero_probe(
                oc.reshape(-1), ov.reshape(-1), pos.reshape(-1), cnt
            )
            return c + eps.astype(c.dtype), oc[0, 1]
        _, outs = jax.lax.scan(body, col, None, length=K_ITERS)
        return outs

    vary = lambda i: (col0 + jnp.int32(i),)
    r = bench(run, name=f"tile w={w}", warmup=1, runs=3, vary=vary)
    s = r.mean_s / K_ITERS
    print(f"pallas tile w={w:5d}: {s*1e3:8.2f} ms  {N/s/1e6:8.1f} M elem/s")


def time_global():
    key0 = jnp.asarray(rng.integers(0, 1 << 30, (N,), dtype=np.uint32))
    val0 = jnp.asarray(rng.random((N,), dtype=np.float32))

    @jax.jit
    def run(key):
        def body(k, _):
            ks, vs = jax.lax.sort((k, val0), num_keys=1)
            eps = runtime_zero_probe(ks, vs)
            return k + eps.astype(k.dtype), ks[N // 2]
        _, outs = jax.lax.scan(body, key, None, length=K_ITERS)
        return outs

    vary = lambda i: (key0 + jnp.uint32(i),)
    r = bench(run, name="global sort", warmup=1, runs=3, vary=vary)
    s = r.mean_s / K_ITERS
    print(f"global u32 sort    : {s*1e3:8.2f} ms  {N/s/1e6:8.1f} M elem/s")


for w in (256, 512, 1024):
    time_tile(w)
time_global()
