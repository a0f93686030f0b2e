"""Stage-delta profile of the chunked SpGEMM pipeline on the real chip.

Times nested prefixes of the pipeline (meta+expand -> +sort -> +runsum ->
full merge) as K-iteration in-graph scans with varied inputs (tunnel
caching trap) and runtime_zero_probe on every live output (DCE trap), then
reports per-stage deltas. Run:
    python scripts/profile_chunked_stages.py [matrix ...]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _expand_chunks,
    _expand_wide,
    _segmented_runsum,
    merge_products,
    row_product_offsets,
    spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import runtime_zero_probe

K_ITERS = 8


def _expand(a, b, plan):
    row, col, val = _expand_chunks(
        a, b, plan.k, plan.chunks_cap, b_pack=plan.b_pack,
        wide_min=plan.wide_min,
    )
    if plan.wide_min:
        rw, cw, vw = _expand_wide(
            a, b, plan.wide_min, plan.wchunks_cap, plan.bpad_cap,
            plan.wide_lanes,
        )
        row = jnp.concatenate([row, rw])
        col = jnp.concatenate([col, cw])
        val = jnp.concatenate([val, vw.astype(val.dtype)])
    return row, col, val


def _sorted_stream(a, b, plan):
    """Expansion + the main sort (packed key exactly as merge_products)."""
    m, n = a.m, b.n
    row, col, val = _expand(a, b, plan)
    if plan.pack_u32:
        cbits = max(int(n - 1).bit_length(), 1)
        rc = (row.astype(jnp.uint32) << cbits) | col.astype(jnp.uint32)
        rc = jnp.where(row >= m, jnp.uint32(0xFFFFFFFF), rc)
        rc, val = jax.lax.sort((rc, val), num_keys=1)
        return rc, val
    cbits = max(int(n).bit_length(), 1)
    if (m + 1) << cbits < (1 << 31):
        rc = (row << cbits) | col
        rc, val = jax.lax.sort((rc, val), num_keys=1)
        return rc, val
    row, col, val = jax.lax.sort((row, col, val), num_keys=2)
    return (row << 1) ^ col, val  # probe carrier only


def stage_fn(stage, plan):
    def run(a, b):
        if stage == "expand":
            row, col, val = _expand(a, b, plan)
            return runtime_zero_probe(row, col, val)
        if stage == "sort":
            rc, val = _sorted_stream(a, b, plan)
            return runtime_zero_probe(rc, val)
        if stage == "runsum":
            rc, val = _sorted_stream(a, b, plan)
            rv = _segmented_runsum(rc, rc, val, plan.max_run)
            return runtime_zero_probe(rc, rv)
        c = spgemm_chunked(a, b, plan)
        return runtime_zero_probe(c.rowptr, c.colidx, c.vals)

    @jax.jit
    def scan(a):
        def body(a_i, _):
            eps = run(a_i, a_i).astype(a_i.vals.dtype)
            return (
                CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape),
                eps,
            )

        _, outs = jax.lax.scan(body, a, None, length=K_ITERS)
        return outs

    return scan


def timeit(fn, a, n=3, warmup=1):
    vals0 = a.vals
    idx = 0

    def varied():
        nonlocal idx
        idx += 1
        return CSR(
            a.rowptr,
            a.colidx,
            jax.block_until_ready(vals0 * (1.0 + 1e-6 * idx)),
            a.shape,
        )

    for _ in range(warmup):
        jax.block_until_ready(fn(varied()))
    ts = []
    for _ in range(n):
        ai = varied()
        t0 = time.perf_counter()
        jax.block_until_ready(fn(ai))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K_ITERS


def main():
    names = sys.argv[1:] or ["er_medium"]
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        plan = make_chunked_plan(a, a)
        print(f"\n=== {name}: plan k={plan.k} chunks={plan.chunks_cap} "
              f"prod_cap={plan.prod_cap} out_cap={plan.out_cap} "
              f"max_run={plan.max_run} wide_min={plan.wide_min} "
              f"pack_u32={plan.pack_u32}")
        prev = 0.0
        for stage in ("expand", "sort", "runsum", "full"):
            t = timeit(stage_fn(stage, plan), a)
            print(f"  {stage:8s} cum {t*1e3:8.2f} ms   delta {(t-prev)*1e3:8.2f} ms")
            prev = t


if __name__ == "__main__":
    main()
