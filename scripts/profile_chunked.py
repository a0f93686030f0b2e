"""Per-stage device-time breakdown of the chunked-ESC pipeline.

Times cumulative prefixes of the pipeline (expand | +sort1 | +runsum |
+sort2 | full) with the K-iteration in-graph scan methodology of bench.py
(amortizes the ~26 ms axon dispatch floor), then reports successive
differences as per-stage costs.

Measurement traps handled (CLAUDE.md):
- every outer run gets distinct value bits (tunnel short-circuits identical
  re-dispatches without executing);
- each stage probe consumes a strided half of every output array — probing
  only [-1] lets XLA rewrite sorts into reduce-max, and sum(sort(x)) can
  legally become sum(x).
    python scripts/profile_chunked.py [matrix ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _expand_chunks,
    _rc_pack_bits,
    _segmented_runsum,
    merge_products,
)
from benchmark_spgemm_using_csr_tpu.utils import generators

K = 8
INDEX_DTYPE = jnp.int32


def probe(*arrays):
    """Parity-masked full reduction: order-dependent (sorts can't be elided
    into plain sums) but contiguous and vectorizable — a stride-2 slice
    probe was measured to cost MORE than the pipeline it probes."""
    acc = jnp.zeros((), jnp.float32)
    for x in arrays:
        par = (jnp.arange(x.shape[0], dtype=jnp.int32) & 1).astype(jnp.float32)
        acc = acc + (x.astype(jnp.float32) * par).sum()
    return acc.astype(jnp.int32)


def timeit(fn, a, n=3, warmup=1):
    def nudged(i):
        out = CSR(a.rowptr, a.colidx,
                  a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape)
        return jax.block_until_ready(out)

    idx = 0
    for _ in range(warmup):
        jax.block_until_ready(fn(nudged(idx)))
        idx += 1
    ts = []
    for _ in range(n):
        arg = nudged(idx)
        idx += 1
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def k_scan(stage_fn):
    """K iterations with a runtime data dependency so XLA can't CSE."""

    @jax.jit
    def run(a):
        def body(a_c, _):
            out = stage_fn(a_c)
            eps = jnp.minimum(out, 0).astype(a_c.vals.dtype)
            a_next = CSR(a_c.rowptr, a_c.colidx, a_c.vals + eps, a_c.shape)
            return a_next, out

        _, outs = jax.lax.scan(body, a, None, length=K)
        return outs

    return run


def profile_matrix(name: str):
    a = CSR.from_scipy(generators.SUITE[name]())
    plan = make_chunked_plan(a, a)
    m, n = a.m, a.n
    bits = _rc_pack_bits(m, n)
    print(
        f"\n=== {name}: m={m} k={plan.k} chunks_cap={plan.chunks_cap} "
        f"prod_cap={plan.prod_cap} out_cap={plan.out_cap} "
        f"max_run={plan.max_run} packed_key={bool(bits)} ==="
    )

    def expand(a_c):
        return _expand_chunks(a_c, a_c, plan.k, plan.chunks_cap)

    def s_expand(a_c):
        row, col, val = expand(a_c)
        return probe(row, col, val)

    def sorted1(a_c):
        row, col, val = expand(a_c)
        if bits:
            rc = (row.astype(INDEX_DTYPE) << bits) | col.astype(INDEX_DTYPE)
            rc, val = jax.lax.sort((rc, val), num_keys=1)
            return (rc, rc, val)  # (row-key, col-key, val) shape-alike
        row, col, val = jax.lax.sort((row, col, val), num_keys=2)
        return (row, col, val)

    def s_sort1(a_c):
        r, c, v = sorted1(a_c)
        return probe(r, c, v)

    def s_runsum(a_c):
        r, c, v = sorted1(a_c)
        run_val = _segmented_runsum(r, c, v, plan.max_run)
        return probe(r, run_val)

    def s_sort2(a_c):
        cap = plan.prod_cap
        r, c, v = sorted1(a_c)
        run_val = _segmented_runsum(r, c, v, plan.max_run)
        if bits:
            valid = r < (m << bits)
            next_r = jnp.concatenate([r[1:], jnp.full((1,), -1, r.dtype)])
            is_tail = valid & (r != next_r)
        else:
            valid = r < m
            next_r = jnp.concatenate([r[1:], jnp.full((1,), -1, r.dtype)])
            next_c = jnp.concatenate([c[1:], jnp.full((1,), -1, c.dtype)])
            is_tail = valid & ((r != next_r) | (c != next_c))
        uniq_pos = jnp.cumsum(is_tail.astype(INDEX_DTYPE)) - 1
        key = jnp.where(is_tail, uniq_pos, cap).astype(INDEX_DTYPE)
        _, c_c, val_c = jax.lax.sort((key, c, run_val), num_keys=1)
        return probe(c_c, val_c)

    def s_full(a_c):
        row, col, val = expand(a_c)
        c = merge_products(row, col, val, m, n, plan.out_cap, plan.max_run,
                           a_c.vals.dtype)
        return probe(c.rowptr, c.colidx, c.vals)

    stages = [
        ("expand", s_expand),
        ("+sort1", s_sort1),
        ("+runsum", s_runsum),
        ("+sort2", s_sort2),
        ("full", s_full),
    ]
    prev = 0.0
    prev_name = "(zero)"
    for sname, fn in stages:
        t = timeit(k_scan(fn), a)
        print(
            f"{sname:8s}: {t*1e3:8.2f} ms cumulative | "
            f"delta vs {prev_name}: {(t-prev)*1e3:8.2f} ms"
        )
        prev, prev_name = t, sname


if __name__ == "__main__":
    names = sys.argv[1:] or ["powerlaw_medium", "er_medium"]
    print("backend:", jax.default_backend(), jax.devices())
    for nm in names:
        profile_matrix(nm)
