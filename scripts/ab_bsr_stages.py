"""Stage-decompose the BSR MXU path on dense_rows_2k (VERDICT r4 #3:
sol 0.228 — either ~4x headroom exists or the ceiling is fiction).

K-scan cumulative-prefix deltas (the only timing CLAUDE.md trusts):
time each PREFIX of the bsr_spgemm pipeline with every live array
consumed by the runtime-zero probe, then difference successive prefixes.
Prefixes:

  meta    — pair expansion metadata (scatter+cumsum, src/b_idx/brow/bcol)
  gather  — + the (P, bm, bk)/(P, bk, bn) block payload gathers
  einsum  — + the batched block matmul (MXU)
  merge   — + metadata sort + scatter-add of product blocks
  full    — the production bsr_spgemm (structure assembly included)

Run on the real chip: python scripts/ab_bsr_stages.py [matrix]
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

from benchmark_spgemm_using_csr_tpu.ops.bsr import bsr_spgemm, make_bsr_plan
from benchmark_spgemm_using_csr_tpu.sparse.csr import (
    BSR, INDEX_DTYPE, row_ids_from_rowptr,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.results import write_result
from benchmark_spgemm_using_csr_tpu.utils.timing import (
    bench_delta_stats,
    runtime_zero_probe,
)

F32 = jnp.float32


def prefix_fn(a: BSR, b: BSR, plan, stage: str):
    """The bsr_spgemm pipeline truncated after ``stage`` (mirrors
    ops/bsr.bsr_spgemm; keep in sync)."""
    bm, bk = a.blocks.shape[1], a.blocks.shape[2]
    bn = b.blocks.shape[2]
    mb = a.shape[0] // bm
    nb = b.shape[1] // bn
    P = plan.pairs_cap

    def run(a_blocks):
        a_i = BSR(a.rowptr, a.colidx, a_blocks, a.shape)
        a_brows = row_ids_from_rowptr(a_i.rowptr, a_i.colidx.shape[0])
        entry_valid = a_brows < mb
        b_len = (b.rowptr[1:] - b.rowptr[:-1]).astype(INDEX_DTYPE)
        per = jnp.where(entry_valid, b_len[a_i.colidx], 0).astype(
            INDEX_DTYPE
        )
        ends = jnp.cumsum(per)
        starts = ends - per
        total = ends[-1]
        hits = jnp.zeros(P, INDEX_DTYPE).at[starts].add(1, mode="drop")
        src = jnp.clip(jnp.cumsum(hits) - 1, 0, a_i.colidx.shape[0] - 1)
        pid = jnp.arange(P, dtype=INDEX_DTYPE)
        pair_valid = pid < total
        inner = pid - starts[src]
        b_idx = jnp.clip(
            b.rowptr[a_i.colidx[src]] + inner, 0, b.colidx.shape[0] - 1
        )
        brow = jnp.where(pair_valid, a_brows[src], mb).astype(INDEX_DTYPE)
        bcol = jnp.where(pair_valid, b.colidx[b_idx], 0).astype(INDEX_DTYPE)
        if stage == "meta":
            return (src, b_idx, brow, bcol)
        a_blk = a_i.blocks[src]
        b_blk = b.blocks[b_idx]
        if stage == "gather":
            return (a_blk, b_blk, brow, bcol)
        prod = jnp.einsum(
            "pij,pjk->pik", a_blk, b_blk,
            preferred_element_type=F32,
            precision=jax.lax.Precision.HIGHEST,
        )
        prod = jnp.where(pair_valid[:, None, None], prod, 0.0)
        if stage == "einsum":
            return (prod, brow, bcol)
        key = jnp.where(pair_valid, brow * nb + bcol, mb * nb).astype(
            INDEX_DTYPE
        )
        key_s, pid_s = jax.lax.sort((key, pid), num_keys=1, is_stable=False)
        prev = jnp.concatenate(
            [jnp.full((1,), -1, key_s.dtype), key_s[:-1]]
        )
        is_head = (key_s != prev) & (key_s < mb * nb)
        uniq_s = jnp.cumsum(is_head.astype(INDEX_DTYPE)) - 1
        slot_s = jnp.where(key_s < mb * nb, uniq_s, plan.out_blocks_cap)
        slot = jnp.zeros(P, INDEX_DTYPE).at[pid_s].set(slot_s)
        out_blocks = jnp.zeros((plan.out_blocks_cap, bm, bn), F32)
        out_blocks = out_blocks.at[slot].add(prod, mode="drop")
        return (out_blocks,)

    return run


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dense_rows_2k"
    a_sp = generators.SUITE[name]()
    a_b = BSR.from_scipy(a_sp, block_shape=(8, 128))
    b_b = BSR.from_scipy(a_sp, block_shape=(128, 128))
    plan = make_bsr_plan(a_b, b_b)
    print(f"{name}: pairs_cap={plan.pairs_cap} "
          f"out_blocks_cap={plan.out_blocks_cap}", flush=True)

    times = {}
    for stage in ("meta", "gather", "einsum", "merge", "full"):
        if stage == "full":
            body = lambda blocks: (
                bsr_spgemm(
                    BSR(a_b.rowptr, a_b.colidx, blocks, a_b.shape),
                    b_b, plan,
                ),
            )

            def mk(c):
                c = c[0]
                return (c.rowptr, c.colidx, c.blocks.reshape(-1))
        else:
            body = prefix_fn(a_b, b_b, plan, stage)
            mk = lambda outs: tuple(
                x.reshape(-1) if x.ndim > 1 else x for x in outs
            )

        def kfac(k, body=body, mk=mk):
            @jax.jit
            def run(blocks):
                def bd(bl, _):
                    outs = mk(body(bl))
                    eps = runtime_zero_probe(*outs).astype(bl.dtype)
                    return bl + eps, outs[-1].reshape(-1)[0]
                _, o = jax.lax.scan(bd, blocks, None, length=k)
                return o
            return run

        dres = bench_delta_stats(
            kfac, lambda i: (a_b.blocks + jnp.float32(1e-6) * i,),
            k1=8, name=f"bsr_{stage}",
        )
        times[stage] = dres.per_s
        print(f"{stage:7s}: {dres.per_s*1e3:7.3f} ms "
              f"(k2={dres.k2}, spread {dres.spread:.1%})", flush=True)

    order = ["meta", "gather", "einsum", "merge", "full"]
    deltas = {}
    prev = 0.0
    for s in order:
        deltas[s] = times[s] - prev
        prev = times[s]
    print("stage deltas (ms):",
          {k: round(v * 1e3, 3) for k, v in deltas.items()}, flush=True)
    write_result(
        "results.jsonl",
        {"matrix": name, "config": "ab_bsr_stages K-scan prefixes",
         **{f"t_{k}_ms": round(v * 1e3, 4) for k, v in times.items()},
         **{f"d_{k}_ms": round(v * 1e3, 4) for k, v in deltas.items()}},
    )


if __name__ == "__main__":
    main()
