"""Descriptor rate for advanced-index gathers from (N, W) int32 tables,
output in transposed (k, chunks) layout like the production expansion.
Also: one (nnzA, P)-operand packed scatter vs P separate 1D scatters.
K-scan stage-delta methodology (CLAUDE.md)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from benchmark_spgemm_using_csr_tpu.utils.timing import bench, runtime_zero_probe

K_ITERS = 8
NB = 1 << 20          # table entries (pairs)
G = 10 * (1 << 20)    # total (col,val) pairs to fetch ~ er_medium's 10.5M

rng = np.random.default_rng(0)

def time_gather(w_pairs):
    """Gather G pairs via descriptors each fetching w_pairs (col,val) pairs.
    Table: (NB / w_pairs, 2*w_pairs) int32. Descriptors: G / w_pairs."""
    nrows = NB // w_pairs
    ndesc = G // w_pairs
    tbl0 = jnp.asarray(rng.integers(0, 1 << 30, (nrows, 2 * w_pairs), dtype=np.int32))
    idx0 = jnp.asarray(rng.integers(0, nrows, (ndesc,), dtype=np.int32))

    @jax.jit
    def run(tbl):
        def body(t, _):
            out = t[idx0, :]  # (ndesc, 2*w_pairs)
            eps = runtime_zero_probe(out.reshape(-1)).astype(t.dtype)
            return t + eps, out[0, 0]
        _, outs = jax.lax.scan(body, tbl, None, length=K_ITERS)
        return outs

    vary = lambda i: (tbl0 + jnp.int32(i),)
    r = bench(run, name=f"gather w={w_pairs}", warmup=1, runs=3, vary=vary)
    s = r.mean_s / K_ITERS
    print(f"gather w_pairs={w_pairs:2d}: {s*1e3:8.2f} ms  "
          f"{ndesc/s/1e6:7.1f} M desc/s  {G*2/s/1e6:8.1f} M elem/s")

def time_scatter(p, fused):
    """Propagate P int32 operands onto a chunk stream: fused (one (n,P)
    scatter) vs separate (P 1D scatters)."""
    n = 1 << 20       # entries (nnzA-like)
    cap = 5 * (1 << 20)
    starts0 = jnp.asarray(np.sort(rng.integers(0, cap, (n,), dtype=np.int32)))
    ops0 = jnp.asarray(rng.integers(0, 1 << 30, (n, p), dtype=np.int32))

    @jax.jit
    def run(ops):
        def body(o, _):
            if fused:
                ref = jnp.zeros((cap, p), jnp.int32)
                acc = ref.at[starts0, :].set(o, mode="drop")
                outs = jnp.cumsum(acc, axis=0)
                probe = runtime_zero_probe(outs.reshape(-1))
            else:
                res = []
                for j in range(p):
                    ref = jnp.zeros(cap, jnp.int32)
                    acc = ref.at[starts0].set(o[:, j], mode="drop")
                    res.append(jnp.cumsum(acc))
                probe = runtime_zero_probe(*res)
            return o + probe.astype(o.dtype), probe
        _, outs = jax.lax.scan(body, ops0, None, length=K_ITERS)
        return outs

    vary = lambda i: (ops0 + jnp.int32(i),)
    r = bench(run, name=f"scatter p={p} fused={fused}", warmup=1, runs=3, vary=vary)
    s = r.mean_s / K_ITERS
    print(f"scatter p={p} fused={int(fused)}: {s*1e3:8.2f} ms  "
          f"{(n if fused else n*p)/s/1e6:7.1f} M desc/s")

for w in (1, 2, 4, 8, 16):
    time_gather(w)
for fused in (False, True):
    time_scatter(3, fused)
