"""A/B the tile-gather layout in the chunked expansion (full pipeline,
K-amortized device time): packed (chunks,k,2) vs two 1D gathers vs
transposed (k,chunks) lanes-large layout, each honest (runtime_zero_probe
consumes every output — probing rowptr[-1] alone lets XLA drop the value
gather, run-sum and compaction sort, which silently skewed the first
version of this comparison).
    python scripts/micro_tilelayout.py [matrix ...]
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
from benchmark_spgemm_using_csr_tpu.sparse.csr import INDEX_DTYPE
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _propagate_entry_consts,
    merge_products,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)

K_ITERS = 4
F32 = jnp.float32


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
    return min(ts) / K_ITERS


def expand_variant(a, b, k, chunks_cap, layout):
    m = a.m
    b_len = b.row_lengths().astype(INDEX_DTYPE)
    a_rows = a.row_ids()
    entry_valid = a_rows < m
    per_nz = jnp.where(entry_valid, b_len[a.colidx], 0).astype(INDEX_DTYPE)
    n_chunks_per = (per_nz + (k - 1)) // k
    ends = jnp.cumsum(n_chunks_per)
    starts = ends - n_chunks_per
    total_chunks = ends[-1]
    hits = jnp.zeros(chunks_cap, INDEX_DTYPE).at[starts].add(1, mode="drop")
    src = jnp.clip(jnp.cumsum(hits) - 1, 0, a.capacity - 1)
    c_ids = jnp.arange(chunks_cap, dtype=INDEX_DTYPE)
    chunk_valid = c_ids < total_chunks
    b_start = b.rowptr[a.colidx].astype(INDEX_DTYPE)
    row, posb, remb = _propagate_entry_consts(
        starts,
        (a_rows.astype(INDEX_DTYPE), b_start - k * starts, per_nz + k * starts),
        chunks_cap,
    )
    pos = posb + k * c_ids
    rem = remb - k * c_ids
    a_val = a.vals[src]
    lane = jnp.arange(k, dtype=INDEX_DTYPE)

    if layout == "packed":
        lane_valid = chunk_valid[:, None] & (lane[None, :] < rem[:, None])
        b_packed = jnp.stack(
            [
                b.colidx.astype(jnp.int32),
                jax.lax.bitcast_convert_type(b.vals.astype(F32), jnp.int32),
            ],
            axis=1,
        )
        gidx = jnp.clip(pos[:, None] + lane[None, :], 0, b.capacity - 1)
        tile = b_packed[gidx, :]
        col = tile[:, :, 0]
        b_val = jax.lax.bitcast_convert_type(tile[:, :, 1], F32)
        val = b_val * a_val[:, None]
        row_t = jnp.where(lane_valid, row[:, None], m)
        col_t = jnp.where(lane_valid, col, 0)
        val_t = jnp.where(lane_valid, val, 0.0)
    elif layout == "packedT":
        # one (capB, 2) packed gather, transposed (k, chunks) index layout
        lane_valid = chunk_valid[None, :] & (lane[:, None] < rem[None, :])
        b_packed = jnp.stack(
            [
                b.colidx.astype(jnp.int32),
                jax.lax.bitcast_convert_type(b.vals.astype(F32), jnp.int32),
            ],
            axis=1,
        )
        gidx = jnp.clip(pos[None, :] + lane[:, None], 0, b.capacity - 1)
        tile = b_packed[gidx, :]  # (k, chunks, 2)
        col = tile[:, :, 0]
        b_val = jax.lax.bitcast_convert_type(tile[:, :, 1], F32)
        val = b_val * a_val[None, :]
        row_t = jnp.where(lane_valid, row[None, :], m)
        col_t = jnp.where(lane_valid, col, 0)
        val_t = jnp.where(lane_valid, val, 0.0)
    elif layout == "two1d":
        lane_valid = chunk_valid[:, None] & (lane[None, :] < rem[:, None])
        gidx = jnp.clip(pos[:, None] + lane[None, :], 0, b.capacity - 1)
        col = b.colidx[gidx].astype(jnp.int32)
        b_val = b.vals[gidx]
        val = b_val * a_val[:, None]
        row_t = jnp.where(lane_valid, row[:, None], m)
        col_t = jnp.where(lane_valid, col, 0)
        val_t = jnp.where(lane_valid, val, 0.0)
    elif layout == "transposed":
        lane_valid = chunk_valid[None, :] & (lane[:, None] < rem[None, :])
        gidx = jnp.clip(pos[None, :] + lane[:, None], 0, b.capacity - 1)
        col = b.colidx[gidx].astype(jnp.int32)  # (k, chunks)
        b_val = b.vals[gidx]
        val = b_val * a_val[None, :]
        row_t = jnp.where(lane_valid, row[None, :], m)
        col_t = jnp.where(lane_valid, col, 0)
        val_t = jnp.where(lane_valid, val, 0.0)
    else:
        raise ValueError(layout)
    return (
        row_t.reshape(-1).astype(INDEX_DTYPE),
        col_t.reshape(-1).astype(INDEX_DTYPE),
        val_t.reshape(-1),
    )


def main():
    names = sys.argv[1:] or ["powerlaw_medium", "er_medium"]
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        plan = make_chunked_plan(a, a)
        golden = spgemm_reference(a, a)
        print(f"\n=== {name}: k={plan.k} chunks_cap={plan.chunks_cap} ===")
        for layout in ("packed", "packedT", "two1d", "transposed"):

            def pipeline(a_c, layout=layout):
                row, col, val = expand_variant(
                    a_c, a_c, plan.k, plan.chunks_cap, layout
                )
                return merge_products(
                    row, col, val, a_c.m, a_c.n, plan.out_cap, plan.max_run,
                    a_c.vals.dtype,
                )

            c = jax.jit(pipeline)(a)
            try:
                assert_csr_equal(c, golden, rtol=1e-3, atol=1e-4)
                ok = True
            except AssertionError:
                ok = False

            from benchmark_spgemm_using_csr_tpu.utils.timing import (
                runtime_zero_probe,
            )

            @jax.jit
            def krun(a_c, layout=layout):
                def body(a_i, _):
                    c = pipeline(a_i, layout)
                    eps = runtime_zero_probe(
                        c.rowptr, c.colidx, c.vals
                    ).astype(a_i.vals.dtype)
                    return (
                        CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape),
                        c.rowptr[-1],
                    )

                _, outs = jax.lax.scan(body, a_c, None, length=K_ITERS)
                return outs

            t = timeit(krun, a)
            print(f"{layout:11s}: {t*1e3:8.2f} ms device  correct={ok}")


if __name__ == "__main__":
    main()
