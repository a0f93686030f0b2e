"""Per-stage device-time breakdown of the chunked-ESC pipeline.

Times cumulative prefixes of the pipeline (expand | +sort1 | +runsum |
+sort2 | full) with the same K-iteration in-graph scan methodology as
bench.py (amortizes the ~26 ms axon dispatch floor), then reports the
successive differences as per-stage costs. Run:
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


def timeit(fn, a, n=3, warmup=1):
    # nudge values per run: the axon tunnel short-circuits bitwise-identical
    # re-dispatches without executing (utils/timing.py docstring)
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
    total = int(
        np.asarray(jax.jit(lambda x: x)(jnp.zeros(())))
    ) * 0  # touch device once
    print(
        f"\n=== {name}: m={m} k={plan.k} chunks_cap={plan.chunks_cap} "
        f"prod_cap={plan.prod_cap} out_cap={plan.out_cap} "
        f"max_run={plan.max_run} packed_key={bool(bits)} ==="
    )

    def expand_only(a_c):
        row, col, val = _expand_chunks(a_c, a_c, plan.k, plan.chunks_cap)
        return row[-1] + col[-1] + val[-1].astype(jnp.int32)

    def plus_sort1(a_c):
        row, col, val = _expand_chunks(a_c, a_c, plan.k, plan.chunks_cap)
        rc = (row.astype(INDEX_DTYPE) << bits) | col.astype(INDEX_DTYPE)
        rc, val = jax.lax.sort((rc, val), num_keys=1)
        return rc[-1] + val[-1].astype(jnp.int32)

    def plus_runsum(a_c):
        row, col, val = _expand_chunks(a_c, a_c, plan.k, plan.chunks_cap)
        rc = (row.astype(INDEX_DTYPE) << bits) | col.astype(INDEX_DTYPE)
        rc, val = jax.lax.sort((rc, val), num_keys=1)
        run_val = _segmented_runsum(rc, rc, val, plan.max_run)
        return rc[-1] + run_val[-1].astype(jnp.int32)

    def plus_sort2(a_c):
        cap = plan.prod_cap
        row, col, val = _expand_chunks(a_c, a_c, plan.k, plan.chunks_cap)
        rc = (row.astype(INDEX_DTYPE) << bits) | col.astype(INDEX_DTYPE)
        rc, val = jax.lax.sort((rc, val), num_keys=1)
        run_val = _segmented_runsum(rc, rc, val, plan.max_run)
        valid = rc < (m << bits)
        next_rc = jnp.concatenate([rc[1:], jnp.full((1,), -1, rc.dtype)])
        is_tail = valid & (rc != next_rc)
        uniq_pos = jnp.cumsum(is_tail.astype(INDEX_DTYPE)) - 1
        key = jnp.where(is_tail, uniq_pos, cap).astype(INDEX_DTYPE)
        _, rc_c, val_c = jax.lax.sort((key, rc, run_val), num_keys=1)
        return rc_c[-1] + val_c[-1].astype(jnp.int32)

    def full(a_c):
        row, col, val = _expand_chunks(a_c, a_c, plan.k, plan.chunks_cap)
        c = merge_products(row, col, val, m, n, plan.out_cap, plan.max_run,
                           a_c.vals.dtype)
        return c.rowptr[-1]

    stages = [
        ("expand", expand_only),
        ("+sort1", plus_sort1),
        ("+runsum", plus_runsum),
        ("+sort2", plus_sort2),
        ("full", full),
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
