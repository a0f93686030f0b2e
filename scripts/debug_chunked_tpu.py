"""Debug chunked-ESC on TPU: correctness diff + per-stage timing."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops import chunked as C
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import spgemm_reference


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def check_small():
    a = CSR.from_scipy(generators.erdos_renyi(300, 300, 6.0, seed=7))
    plan = C.make_chunked_plan(a, a)
    c = C.spgemm_chunked(a, a, plan)
    want = spgemm_reference(a, a)
    want = want.to_scipy() if hasattr(want, "to_scipy") else want
    got = c.to_scipy()
    print("plan:", plan)
    print("nnz got/want:", got.nnz, want.nnz)
    import scipy.sparse as sp

    d = abs(got - want.astype(np.float32))
    print("max abs diff:", d.max() if d.nnz else 0.0)
    # structural diff
    gs = set(zip(*got.nonzero()))
    ws = set(zip(*want.nonzero()))
    print("extra:", list(gs - ws)[:5], "missing:", list(ws - gs)[:5])

    # stage-level recheck on TPU
    row, col, val = jax.jit(
        partial(C._expand_chunks, k=plan.k, chunks_cap=plan.chunks_cap)
    )(a, a)
    row, col, val = map(np.asarray, (row, col, val))
    valid = row < a.m
    # golden product multiset
    asp = a.to_scipy()
    prods = {}
    for i in range(a.m):
        for jj in range(asp.indptr[i], asp.indptr[i + 1]):
            k_ = asp.indices[jj]
            av = asp.data[jj]
            for ll in range(asp.indptr[k_], asp.indptr[k_ + 1]):
                key = (i, asp.indices[ll])
                prods[key] = prods.get(key, 0.0) + av * asp.data[ll]
    got_prods = {}
    for r, c_, v in zip(row[valid], col[valid], val[valid]):
        got_prods[(r, c_)] = got_prods.get((r, c_), 0.0) + v
    missing = [k for k in prods if k not in got_prods]
    extra = [k for k in got_prods if k not in prods]
    print("expand products: missing", missing[:5], "extra", extra[:5])
    bad = [
        k
        for k in prods
        if k in got_prods and abs(prods[k] - got_prods[k]) > 1e-3 * (1 + abs(prods[k]))
    ]
    print("expand value mismatches:", bad[:5], "count", len(bad))


def stage_profile(name="er_medium"):
    a = CSR.from_scipy(generators.SUITE[name]())
    plan = C.make_chunked_plan(a, a)
    print(f"\n=== {name} plan={plan} prod={plan.prod_cap} ===")

    expand = jax.jit(partial(C._expand_chunks, k=plan.k, chunks_cap=plan.chunks_cap))
    t = timeit(expand, a, a)
    print(f"expand_chunks  : {t*1e3:9.2f} ms")
    row, col, val = expand(a, a)

    s1 = jax.jit(lambda r, c, v: jax.lax.sort((r, c, v), num_keys=2))
    t = timeit(s1, row, col, val)
    print(f"sort1 (r,c,v)  : {t*1e3:9.2f} ms")
    row_s, col_s, val_s = s1(row, col, val)

    rs = jax.jit(C._segmented_runsum)
    t = timeit(rs, row_s, col_s, val_s)
    print(f"runsum         : {t*1e3:9.2f} ms")

    cap = row.shape[0]
    m = a.m

    def tail_and_key(row, col, run_val):
        valid = row < m
        next_row = jnp.concatenate([row[1:], jnp.full((1,), -1, row.dtype)])
        next_col = jnp.concatenate([col[1:], jnp.full((1,), -1, col.dtype)])
        is_tail = valid & ((row != next_row) | (col != next_col))
        uniq_pos = jnp.cumsum(is_tail.astype(jnp.int32)) - 1
        key = jnp.where(is_tail, uniq_pos, cap).astype(jnp.int32)
        return key

    tk = jax.jit(tail_and_key)
    t = timeit(tk, row_s, col_s, val_s)
    print(f"tail+key       : {t*1e3:9.2f} ms")
    key = tk(row_s, col_s, val_s)

    s2 = jax.jit(lambda k, r, c, v: jax.lax.sort((k, r, c, v), num_keys=1))
    t = timeit(s2, key, row_s, col_s, val_s)
    print(f"sort2 (compact): {t*1e3:9.2f} ms")
    _, row_c, col_c, val_c = s2(key, row_s, col_s, val_s)

    def rp(row_c):
        needles = jnp.arange(m + 1, dtype=jnp.int32)
        return jnp.searchsorted(row_c[: plan.out_cap], needles, side="left")

    t = timeit(jax.jit(rp), row_c)
    print(f"rowptr search  : {t*1e3:9.2f} ms")

    t = timeit(lambda: C.spgemm_chunked(a, a, plan))
    flops = 2 * int(np.asarray(jnp.sum(val != 0)))  # rough
    print(f"fused e2e      : {t*1e3:9.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.devices())
    check_small()
    stage_profile("er_medium")
