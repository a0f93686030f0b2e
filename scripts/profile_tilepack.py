"""Stage-delta profile of the packed-tile pipeline on-chip (K-scan)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from functools import partial
from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops.tilepack import (
    make_tilepack_plan, TilePackPlan, SENTINEL,
)
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    _propagate_entry_consts, _shift_compact,
)
from benchmark_spgemm_using_csr_tpu.sparse.csr import INDEX_DTYPE
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.timing import bench, runtime_zero_probe

F32 = jnp.float32
K_ITERS = 8


def stages(a, b, slot0, q, first_rank, plan, upto):
    """Replica of _spgemm_tilepack cut at `upto`."""
    from benchmark_spgemm_using_csr_tpu.ops.pallas_kernels import tile_sort_merge

    m, n = a.m, b.n
    al, W, wlr = plan.al, plan.w, plan.wlr
    S = plan.s_cap
    nrows_tbl = plan.abpad_cap // al
    b_len_all = b.row_lengths().astype(INDEX_DTYPE)
    ws = ((b_len_all + al - 1) // al) * al
    pstart = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(ws)])[:-1]
    tstart = pstart // al
    hits_t = jnp.zeros(nrows_tbl, INDEX_DTYPE).at[tstart[1:]].add(1, mode="drop")
    rowid = jnp.cumsum(hits_t)
    rp = b.rowptr.astype(INDEX_DTYPE)
    base_off = rp[:-1] - pstart
    tmeta = jnp.stack([base_off, rp[1:]], axis=1)
    tm = tmeta[rowid, :]
    t_ids = jnp.arange(nrows_tbl, dtype=INDEX_DTYPE)
    src0 = tm[:, 0] + t_ids * al
    lane = jnp.arange(al, dtype=INDEX_DTYPE)
    src_l = src0[:, None] + lane[None, :]
    valid_tbl = src_l < tm[:, 1:2]
    src2 = jnp.clip(src_l, 0, b.capacity - 1)
    b_packed = jnp.stack(
        [b.colidx.astype(jnp.int32),
         jax.lax.bitcast_convert_type(b.vals.astype(F32), jnp.int32)], axis=1)
    raw = b_packed[src2.reshape(-1), :].reshape(nrows_tbl, al, 2)
    tbl = jnp.stack(
        [jnp.where(valid_tbl, raw[:, :, 0], -1),
         jnp.where(valid_tbl, raw[:, :, 1], 0)], axis=2,
    ).reshape(nrows_tbl, 2 * al)

    a_rows = a.row_ids()
    entry_valid = a_rows < m
    meta_pair = jnp.stack([pstart, b_len_all], axis=1)
    pair = meta_pair[a.colidx, :]
    per_nz = jnp.where(entry_valid, pair[:, 1], 0)
    p_start = jnp.where(per_nz > 0, pair[:, 0], plan.abpad_cap - al)
    n_chunks_per = (per_nz + (al - 1)) // al
    if plan.scatter_set:
        n_chunks_per = jnp.where(entry_valid, jnp.maximum(n_chunks_per, 1), 0)
    ends = jnp.cumsum(n_chunks_per)
    starts = ends - n_chunks_per
    arp = a.rowptr.astype(INDEX_DTYPE)
    row_chunk_start = jnp.where(arp > 0, ends[jnp.maximum(arp - 1, 0)], 0)
    g_row = slot0.astype(INDEX_DTYPE) - row_chunk_start[:-1]
    d_g = g_row - jnp.concatenate([jnp.zeros((1,), g_row.dtype), g_row[:-1]])
    spread = jnp.zeros(a.capacity, INDEX_DTYPE).at[arp[:-1]].add(d_g, mode="drop")
    fs = starts + jnp.cumsum(spread)
    q_posb = p_start - al * fs
    q_aval = jax.lax.bitcast_convert_type(a.vals.astype(F32), jnp.int32)
    posb, aval_bits = _propagate_entry_consts(
        fs, (q_posb, q_aval), S, use_set=plan.scatter_set)
    a_val = jax.lax.bitcast_convert_type(aval_bits, F32)
    s_ids = jnp.arange(S, dtype=INDEX_DTYPE)
    pos = posb + al * s_ids
    row_chunks = row_chunk_start[1:] - row_chunk_start[:-1]
    rend = slot0.astype(INDEX_DTYPE) + row_chunks
    d_re = rend - jnp.concatenate([jnp.zeros((1,), rend.dtype), rend[:-1]])
    re_acc = jnp.zeros(S, INDEX_DTYPE).at[
        jnp.minimum(slot0.astype(INDEX_DTYPE), S - 1)
    ].add(d_re, mode="drop")
    rend_slot = jnp.cumsum(re_acc)
    slot_live = s_ids < rend_slot
    if upto == "meta":
        return pos, rend_slot, a_val, tbl.reshape(-1)

    trow = jnp.clip(pos // al, 0, nrows_tbl - 1)
    out = tbl[trow, :]
    col = out[:, 0::2]
    b_val = jax.lax.bitcast_convert_type(out[:, 1::2], F32)
    val = b_val * a_val[:, None]
    lv = slot_live[:, None] & (col >= 0)
    hits_r = jnp.zeros(S + 1, INDEX_DTYPE).at[
        jnp.where(row_chunks > 0, slot0.astype(INDEX_DTYPE), S)
    ].add(1, mode="drop")
    rank = jnp.cumsum(hits_r[:S])
    fr_b = jnp.broadcast_to(
        first_rank.astype(INDEX_DTYPE)[:, None], (plan.t_cap, wlr)).reshape(-1)
    lr = rank - 1 - fr_b
    key_hi = lr << plan.cbits
    key = jnp.where(lv, key_hi[:, None] | col, SENTINEL)
    valm = jnp.where(lv, val, 0.0)
    key2 = key.reshape(plan.t_cap, W)
    val2 = valm.reshape(plan.t_cap, W)
    if upto == "expand":
        return key2.reshape(-1), val2.reshape(-1)

    okey, oval, pos_t, cnt_lr = tile_sort_merge(
        key2, val2, sentinel=SENTINEL, wlr=plan.wlr_eff, cbits=plan.cbits,
        interpret=plan.interpret)
    if upto == "kernel":
        return okey.reshape(-1), oval.reshape(-1), pos_t.reshape(-1), cnt_lr.reshape(-1)

    counts_flat = jnp.concatenate([cnt_lr.reshape(-1), jnp.zeros((1,), jnp.int32)])
    counts_row = counts_flat[q].astype(INDEX_DTYPE)
    rowptr = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(counts_row)])
    cnt_tile = jnp.sum(cnt_lr, axis=1)
    tprefix = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_tile)])[:-1]
    tprefix_b = jnp.broadcast_to(tprefix[:, None], (plan.t_cap, W)).reshape(-1)
    posf = pos_t.reshape(-1)
    kept = posf < W
    uniq = tprefix_b + posf
    disp = jnp.arange(plan.t_cap * W, dtype=INDEX_DTYPE) - uniq
    keyc, valc = _shift_compact(
        kept, jnp.where(kept, disp, 0),
        [okey.reshape(-1), oval.reshape(-1)], plan.disp_bits)
    out_col = (keyc[: plan.out_cap] & ((1 << plan.cbits) - 1)).astype(INDEX_DTYPE)
    out_val = valc[: plan.out_cap].astype(a.vals.dtype)
    return rowptr, out_col, out_val


def time_upto(a, sched, upto, flops):
    plan = sched.plan

    @jax.jit
    def run(a_c):
        def body(a_i, _):
            outs = stages(a_i, a_i, sched.slot0, sched.q, sched.first_rank,
                          plan, upto)
            eps = runtime_zero_probe(*outs).astype(a_i.vals.dtype)
            return (CSR(a_i.rowptr, a_i.colidx, a_i.vals + eps, a_i.shape),
                    eps)
        _, o = jax.lax.scan(body, a_c, None, length=K_ITERS)
        return o

    vary = lambda i: (
        CSR(a.rowptr, a.colidx, a.vals + jnp.float32(1e-6) * i, a.shape),)
    r = bench(run, name=upto, warmup=1, runs=3, vary=vary)
    return r.mean_s / K_ITERS


for name in sys.argv[1:] or ("er_medium",):
    a = CSR.from_scipy(generators.SUITE[name]())
    sched = make_tilepack_plan(a, a)
    print(f"=== {name}: w={sched.plan.w} t_cap={sched.plan.t_cap} "
          f"stream={sched.plan.t_cap*sched.plan.w/1e6:.1f}M "
          f"disp_bits={sched.plan.disp_bits}")
    prev = 0.0
    for upto in ("meta", "expand", "kernel", "full"):
        s = time_upto(a, sched, upto, 0)
        print(f"  {upto:8s} cum {s*1e3:8.2f} ms   delta {(s-prev)*1e3:8.2f} ms")
        prev = s
