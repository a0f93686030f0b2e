"""Stage-delta profile of the grouped-ESC pipeline on the real chip.

Times nested prefixes (meta -> +expand -> +sort -> +runsum -> full) as
K-iteration in-graph scans with varied inputs and runtime_zero_probe on
every live output. Run:
    python scripts/profile_grouped_stages.py [matrix ...] [--al 0|8]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops import grouped as G
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta,
    runtime_zero_probe,
)

K = 8


def _prefix(a, b, sched, stage: str):
    """Re-run the production pipeline up to `stage`, probing live arrays.

    Mirrors ops/grouped._spgemm_grouped; keep in sync."""
    plan = sched.plan
    slot0, first_rank = sched.slot0, sched.first_rank
    sorted_off, fill_end = sched.sorted_off, sched.fill_end
    m = a.m
    al, lanes = plan.al, plan.lanes
    S = plan.s_cap
    W = plan.cs * lanes
    F32 = jnp.float32
    IDX = jnp.int32
    a_rows = a.row_ids()
    entry_valid = a_rows < m
    if al:
        nrows_tbl = plan.abpad_cap // al
        b_len_all = b.row_lengths().astype(IDX)
        ws = ((b_len_all + al - 1) // al) * al
        pstart = jnp.concatenate(
            [jnp.zeros((1,), IDX), jnp.cumsum(ws)])[:-1]
        tstart = pstart // al
        hits_t = jnp.zeros(nrows_tbl, IDX).at[tstart[1:]].add(1, mode="drop")
        rowid = jnp.cumsum(hits_t)
        rp = b.rowptr.astype(IDX)
        tmeta = jnp.stack([rp[:-1] - pstart, rp[1:]], axis=1)
        tm = tmeta[rowid, :]
        t_ids = jnp.arange(nrows_tbl, dtype=IDX)
        src0 = tm[:, 0] + t_ids * al
        lane = jnp.arange(al, dtype=IDX)
        src_l = src0[:, None] + lane[None, :]
        valid_tbl = src_l < tm[:, 1:2]
        src2 = jnp.clip(src_l, 0, b.capacity - 1)
        b_packed = jnp.stack(
            [b.colidx.astype(jnp.int32),
             jax.lax.bitcast_convert_type(b.vals.astype(F32), jnp.int32)],
            axis=1)
        raw = b_packed[src2.reshape(-1), :].reshape(nrows_tbl, al, 2)
        tbl = jnp.stack(
            [jnp.where(valid_tbl, raw[:, :, 0], -1),
             jnp.where(valid_tbl, raw[:, :, 1], 0)], axis=2,
        ).reshape(nrows_tbl, 2 * al)
        meta_pair = jnp.stack([pstart, b_len_all], axis=1)
        pair = meta_pair[a.colidx, :]
        p_start0 = pair[:, 0]
        per_nz = jnp.where(entry_valid, pair[:, 1], 0)
        p_start = jnp.where(per_nz > 0, p_start0, plan.abpad_cap - al)
    else:
        rp = b.rowptr.astype(IDX)
        rp_pair = jnp.stack([rp[:-1], rp[1:]], axis=1)
        pair = rp_pair[a.colidx, :]
        per_nz = jnp.where(entry_valid, pair[:, 1] - pair[:, 0], 0)
        p_start = jnp.where(per_nz > 0, pair[:, 0], jnp.asarray(-1, IDX))

    n_chunks_per = (per_nz + (lanes - 1)) // lanes
    if plan.scatter_set:
        n_chunks_per = jnp.where(entry_valid, jnp.maximum(n_chunks_per, 1), 0)
    ends = jnp.cumsum(n_chunks_per)
    starts = ends - n_chunks_per
    arp = a.rowptr.astype(IDX)
    row_chunk_start = jnp.where(arp > 0, ends[jnp.maximum(arp - 1, 0)], 0)
    g_row = slot0.astype(IDX) - row_chunk_start[:-1]
    d_g = g_row - jnp.concatenate([jnp.zeros((1,), g_row.dtype), g_row[:-1]])
    spread = jnp.zeros(a.capacity, IDX).at[arp[:-1]].add(d_g, mode="drop")
    fs = starts + jnp.cumsum(spread)

    BIG = jnp.asarray(1 << 30, IDX)
    q_posb = p_start - lanes * fs
    d_pb = q_posb - jnp.concatenate(
        [jnp.zeros((1,), q_posb.dtype), q_posb[:-1]])
    acc = jnp.zeros(S, IDX)
    if plan.scatter_set:
        acc = acc.at[fs].set(d_pb, mode="drop")
    else:
        acc = acc.at[fs].add(d_pb, mode="drop")
    g_bases = jnp.arange(1, plan.g_cap, dtype=IDX) * plan.cs
    acc = acc.at[g_bases].add(BIG, mode="drop")
    acc = acc.at[fill_end.astype(IDX)].add(-BIG, mode="drop")
    posb = jnp.cumsum(acc)
    q_aval = jax.lax.bitcast_convert_type(a.vals.astype(F32), jnp.int32)
    (aval_bits,) = G._propagate_entry_consts(
        fs, (q_aval,), S, use_set=plan.scatter_set)
    a_val = jax.lax.bitcast_convert_type(aval_bits, F32)
    s_ids = jnp.arange(S, dtype=IDX)
    pos = posb + lanes * s_ids
    row_chunks = row_chunk_start[1:] - row_chunk_start[:-1]
    hits_r = jnp.zeros(S + 1, IDX).at[
        jnp.where(row_chunks > 0, slot0.astype(IDX), S)].add(1, mode="drop")
    rank = jnp.cumsum(hits_r[:S])
    fr_b = jnp.broadcast_to(
        first_rank.astype(IDX)[:, None], (plan.g_cap, plan.cs)).reshape(-1)
    lr = rank - 1 - fr_b
    if stage == "meta":
        return runtime_zero_probe(pos, a_val, lr)

    if al:
        trow = jnp.clip(pos // al, 0, nrows_tbl - 1)
        out = tbl[trow, :]
        col = out[:, 0::2]
        b_val = jax.lax.bitcast_convert_type(out[:, 1::2], F32)
        val = b_val * a_val[:, None]
        lv = (pos >= 0)[:, None] & (col >= 0)
    else:
        gidx = jnp.clip(pos, 0, b.capacity - 1)
        b_packed = jnp.stack(
            [b.colidx.astype(jnp.int32),
             jax.lax.bitcast_convert_type(b.vals.astype(F32), jnp.int32)],
            axis=1)
        tile = b_packed[gidx, :]
        col = tile[:, 0:1]
        b_val = jax.lax.bitcast_convert_type(tile[:, 1:2], F32)
        val = b_val * a_val[:, None]
        lv = (pos >= 0)[:, None]
    key_hi = lr.astype(jnp.uint32) << plan.cbits
    key = jnp.where(lv, key_hi[:, None] | col.astype(jnp.uint32),
                    G.SENTINEL_U32)
    valm = jnp.where(lv, val, 0.0)
    if stage == "expand":
        return runtime_zero_probe(
            jax.lax.bitcast_convert_type(key, jnp.int32).reshape(-1),
            valm.reshape(-1))

    key2 = key.reshape(plan.g_cap, W)
    val2 = valm.reshape(plan.g_cap, W)
    okey, oval = jax.lax.sort(
        (key2, val2), dimension=1, num_keys=1, is_stable=False
    )
    okey = okey.reshape(-1)
    oval = oval.reshape(-1)
    if stage == "sort":
        return runtime_zero_probe(
            jax.lax.bitcast_convert_type(okey, jnp.int32), oval)

    gid = jax.lax.broadcasted_iota(jnp.int32, (plan.g_cap, W), 0).reshape(-1)
    run = G._segmented_runsum(
        gid, jax.lax.bitcast_convert_type(okey, jnp.int32), oval,
        max_run=plan.max_run)
    if stage == "runsum":
        return runtime_zero_probe(
            jax.lax.bitcast_convert_type(okey, jnp.int32), run)
    raise ValueError(stage)


def main() -> None:
    args = [x for x in sys.argv[1:] if not x.startswith("--")]
    al = None
    if "--al" in sys.argv:
        al = int(sys.argv[sys.argv.index("--al") + 1])
    names = args or ["webbase_1m"]
    print("backend:", jax.devices())
    for name in names:
        a_sp = generators.SUITE[name]()
        a = CSR.from_scipy(a_sp)
        sched = G.make_grouped_plan(a, a, al=al)
        if sched is None:
            print(f"{name}: no plan")
            continue
        p = sched.plan
        print(f"=== {name}: al={p.al} cs={p.cs} g_cap={p.g_cap} "
              f"prod_cap={p.prod_cap} max_run={p.max_run} "
              f"lbits={p.lbits} cbits={p.cbits}", flush=True)
        vary = lambda i: (CSR(
            a.rowptr, a.colidx,
            a.vals + jnp.asarray(1e-6 * i, a.vals.dtype), a.shape),)
        prev = 0.0
        for stage in ("meta", "expand", "sort", "runsum", "full"):
            if stage == "full":
                fn = lambda x, s=sched: runtime_zero_probe(
                    *(lambda c: (c.rowptr, c.colidx, c.vals))(
                        G.spgemm_grouped(x, x, s)))
            else:
                fn = lambda x, st=stage, s=sched: _prefix(x, x, s, st)

            def mk(k=K, f=fn):
                @jax.jit
                def run(a_c):
                    def body(c, _):
                        eps = f(c).astype(c.vals.dtype)
                        return CSR(c.rowptr, c.colidx, c.vals + eps,
                                   c.shape), eps
                    _, outs = jax.lax.scan(body, a_c, None, length=k)
                    return outs
                return run

            t, _k2 = bench_delta(mk, vary, k1=K, name=f"{name}_{stage}")
            print(f"  {stage:7s} cum {t*1e3:9.2f} ms   delta "
                  f"{(t - prev)*1e3:8.2f} ms", flush=True)
            prev = t


if __name__ == "__main__":
    main()
