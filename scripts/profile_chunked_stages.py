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
    if plan.al:
        from benchmark_spgemm_using_csr_tpu.ops.chunked import _expand_aligned

        row, col, val = _expand_aligned(
            a, b, plan.al, plan.chunks_cap, plan.abpad_cap,
            wide_min=plan.wide_min, scatter_set=plan.scatter_set,
            al_min=plan.al_min,
        )
        if plan.al_min:
            rn, cn, vn = _expand_chunks(
                a, b, 1, plan.nchunks_cap, wide_min=plan.al_min,
                scatter_set=plan.scatter_set,
            )
            row = jnp.concatenate([row, rn])
            col = jnp.concatenate([col, cn])
            val = jnp.concatenate([val, vn.astype(val.dtype)])
    else:
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


def _meta_only(a, b, plan, prop="real"):
    """Chunk metadata propagations + masks, WITHOUT the packed-B gather.

    prop: "real" = scatter+cumsum delta propagation (production);
    "fake" = same-shaped elementwise junk (isolates scatter+cumsum cost);
    "fused2d" = one (4, cap) scatter along axis 1 + lane-axis cumsums.
    """
    import benchmark_spgemm_using_csr_tpu.ops.chunked as ch

    k, chunks_cap = plan.k, plan.chunks_cap
    m = a.m
    a_rows = a.row_ids()
    entry_valid = a_rows < m
    rp = b.rowptr.astype(jnp.int32)
    rp_pair = jnp.stack([rp[:-1], rp[1:]], axis=1)
    pair = rp_pair[a.colidx, :]
    b_start = pair[:, 0]
    per_nz = jnp.where(entry_valid, pair[:, 1] - pair[:, 0], 0)
    n_chunks_per = (per_nz + (k - 1)) // k
    ends = jnp.cumsum(n_chunks_per)
    starts = ends - n_chunks_per
    total_chunks = ends[-1]
    c_ids = jnp.arange(chunks_cap, dtype=jnp.int32)
    chunk_valid = c_ids < total_chunks
    arp = a.rowptr.astype(jnp.int32)
    row_chunk_start = jnp.where(arp > 0, ends[jnp.maximum(arp - 1, 0)], 0)
    hits_r = jnp.zeros(chunks_cap, jnp.int32).at[row_chunk_start[1:]].add(
        1, mode="drop"
    )
    row_real = jnp.cumsum(hits_r)
    q_row = a_rows.astype(jnp.int32)
    q_posb = b_start - k * starts
    q_remb = per_nz + k * starts
    q_aval = jax.lax.bitcast_convert_type(a.vals.astype(jnp.float32), jnp.int32)
    if prop == "fake":
        # same shapes/dtypes, no scatter/cumsum; junk values (gidx is
        # clipped so the downstream gather stays in-range)
        s0 = q_row[0] + q_posb[-1] + q_remb[0] + q_aval[-1]
        row = (c_ids * 3 + s0) % jnp.int32(max(a.m, 1))
        posb = (c_ids * 5 + s0) % jnp.int32(b.capacity)
        remb = (c_ids * 7 + s0) % jnp.int32(64)
        aval_bits = c_ids ^ s0
    elif prop == "set":
        # scatter-SET timing probe: correct only when no two entries share
        # a start (i.e. no empty B rows); here timing-only
        outs = []
        for q in (q_row, q_posb, q_remb, q_aval):
            d = q - jnp.concatenate([jnp.zeros((1,), q.dtype), q[:-1]])
            acc = jnp.zeros(chunks_cap, q.dtype).at[starts].set(d, mode="drop")
            outs.append(jnp.cumsum(acc))
        row, posb, remb, aval_bits = outs
    elif prop == "fused2d":
        deltas = []
        for q in (q_row, q_posb, q_remb, q_aval):
            deltas.append(q - jnp.concatenate([jnp.zeros((1,), q.dtype), q[:-1]]))
        acc = jnp.zeros((4, chunks_cap), jnp.int32).at[:, starts].add(
            jnp.stack(deltas), mode="drop"
        )
        c4 = jnp.cumsum(acc, axis=1)
        row, posb, remb, aval_bits = c4[0], c4[1], c4[2], c4[3]
    else:
        posb, remb, aval_bits = ch._propagate_entry_consts(
            starts, (q_posb, q_remb, q_aval), chunks_cap,
            use_set=plan.scatter_set,
        )
        row = row_real
    pos = posb + k * c_ids
    rem = remb - k * c_ids
    lane = jnp.arange(k, dtype=jnp.int32)
    lane_valid = chunk_valid[None, :] & (lane[:, None] < rem[None, :])
    gidx = jnp.clip(pos[None, :] + lane[:, None], 0, b.capacity - 1)
    return (
        row, aval_bits, gidx.reshape(-1),
        lane_valid.reshape(-1).astype(jnp.int32),
    )


def stage_fn(stage, plan):
    def run(a, b):
        if stage == "meta":
            return runtime_zero_probe(*_meta_only(a, b, plan))
        if stage == "meta_fake":
            return runtime_zero_probe(*_meta_only(a, b, plan, prop="fake"))
        if stage == "meta_f2d":
            return runtime_zero_probe(*_meta_only(a, b, plan, prop="fused2d"))
        if stage == "meta_set":
            return runtime_zero_probe(*_meta_only(a, b, plan, prop="set"))
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


STAGES = ("meta", "expand", "sort", "runsum", "full")


def main():
    global STAGES
    names = [x for x in sys.argv[1:] if not x.startswith("--")] or ["er_medium"]
    for arg in sys.argv[1:]:
        if arg.startswith("--stages="):
            STAGES = tuple(arg.split("=", 1)[1].split(","))
    print("backend:", jax.devices())
    for name in names:
        a = CSR.from_scipy(generators.SUITE[name]())
        plan = make_chunked_plan(a, a)
        print(f"\n=== {name}: plan k={plan.k} chunks={plan.chunks_cap} "
              f"prod_cap={plan.prod_cap} out_cap={plan.out_cap} "
              f"max_run={plan.max_run} wide_min={plan.wide_min} "
              f"pack_u32={plan.pack_u32}")
        prev = 0.0
        for stage in STAGES:
            t = timeit(stage_fn(stage, plan), a)
            print(f"  {stage:8s} cum {t*1e3:8.2f} ms   delta {(t-prev)*1e3:8.2f} ms")
            prev = t


if __name__ == "__main__":
    main()
