"""Distributed SpGEMM: 1D row partitioning of A and C over a device mesh.

The reference is single-GPU (SURVEY.md §3: no distributed backend exists);
the distribution story is mandated new design (BASELINE.json:5): A and C
row-sharded, B replicated or row-sharded, remote B rows exchanged over
ICI/DCN. Two schedules:

- ``dist_spgemm_replicated``: B replicated on every device; pure local
  compute under ``jax.shard_map``. The correctness + scaling harness.
- ``dist_spgemm_ring``: B row-sharded; B blocks rotate around the ring via
  ``ppermute`` while each device multiplies its local A entries against the
  resident block (the memory-scalable path — the structural analogue of
  ring attention's KV rotation, SURVEY.md §7.7). Every intermediate product
  lands at a precomputed position in the local product buffer, so a single
  sort-compress at the end produces local C rows — no per-step CSR merging.

Sharded representation: per-shard blocks stacked on a leading axis
(``rowptr: (P, m_loc+1)``, ``colidx/vals: (P, cap)``), equal static padding
per shard so shard_map sees uniform blocks.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..sparse.csr import CSR, INDEX_DTYPE, pad_bucket
from ..ops.chunked import (
    _expand_chunks,
    merge_products,
    pad_gentle,
    row_product_offsets,
)
from ..ops.symbolic import products_per_nz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedCSR:
    """Row-sharded CSR: shard i holds rows [i*m_loc, (i+1)*m_loc)."""

    rowptr: jax.Array  # (P, m_loc + 1) — local rowptrs (start at 0)
    colidx: jax.Array  # (P, cap)
    vals: jax.Array  # (P, cap)
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.rowptr.shape[0]

    @property
    def m_loc(self) -> int:
        return self.rowptr.shape[1] - 1

    @property
    def cap(self) -> int:
        return self.colidx.shape[1]


def shard_rows(a: CSR, n_shards: int, cap: int | None = None) -> ShardedCSR:
    """Host-side 1D row partition. m is padded up to a multiple of n_shards
    with empty rows (padding rows produce empty C rows, trimmed on unshard)."""
    m, n = a.shape
    m_pad = ((m + n_shards - 1) // n_shards) * n_shards
    m_loc = m_pad // n_shards
    rowptr = np.asarray(a.rowptr)
    rowptr_full = np.concatenate([rowptr, np.full(m_pad - m, rowptr[-1], rowptr.dtype)])
    colidx = np.asarray(a.colidx)
    vals = np.asarray(a.vals)

    starts = rowptr_full[np.arange(n_shards) * m_loc]
    ends = rowptr_full[(np.arange(n_shards) + 1) * m_loc]
    if cap is None:
        cap = pad_bucket(int((ends - starts).max()) if n_shards else 1)
    rp = np.zeros((n_shards, m_loc + 1), np.int32)
    ci = np.zeros((n_shards, cap), np.int32)
    va = np.zeros((n_shards, cap), vals.dtype)
    for i in range(n_shards):
        lo, hi = int(starts[i]), int(ends[i])
        rp[i] = rowptr_full[i * m_loc : (i + 1) * m_loc + 1] - lo
        ci[i, : hi - lo] = colidx[lo:hi]
        va[i, : hi - lo] = vals[lo:hi]
    return ShardedCSR(jnp.asarray(rp), jnp.asarray(ci), jnp.asarray(va), (m, n))


def unshard(c: ShardedCSR, trim: bool = True) -> CSR:
    """Host-side inverse of shard_rows (concatenate + repack)."""
    m, n = c.shape
    P_, m_loc = c.n_shards, c.m_loc
    rp = np.asarray(c.rowptr)
    ci = np.asarray(c.colidx)
    va = np.asarray(c.vals)
    nnz_per = rp[:, -1]
    total = int(nnz_per.sum())
    colidx = np.zeros(pad_bucket(total), np.int32)
    vals = np.zeros(pad_bucket(total), va.dtype)
    rowptr = np.zeros(P_ * m_loc + 1, np.int32)
    off = 0
    for i in range(P_):
        k = int(nnz_per[i])
        colidx[off : off + k] = ci[i, :k]
        vals[off : off + k] = va[i, :k]
        rowptr[i * m_loc + 1 : (i + 1) * m_loc + 1] = rp[i, 1:] + off
        off += k
    rowptr_out = rowptr[: m + 1] if trim else rowptr
    return CSR(
        jnp.asarray(rowptr_out), jnp.asarray(colidx), jnp.asarray(vals), (m, n)
    )


# ---------------------------------------------------------------------------
# Replicated-B schedule
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _replicated_exec(mesh, axis, m_loc, kdim, n, chunk_k, chunks_cap, out_cap):
    """Cached compiled executable — re-tracing shard_map per call costs
    seconds of compile time; cache key = mesh + static shape plan."""

    def local_fn(a_rp, a_ci, a_va, b_rp, b_ci, b_va):
        a_loc = CSR(a_rp[0], a_ci[0], a_va[0], (m_loc, kdim))
        b_full = CSR(b_rp, b_ci, b_va, (kdim, n))
        row, col, val = _expand_chunks(a_loc, b_full, chunk_k, chunks_cap)
        c_loc = merge_products(row, col, val, m_loc, n, out_cap,
                               val_dtype=a_va.dtype,
                               prodstart=row_product_offsets(a_loc, b_full))
        return c_loc.rowptr[None], c_loc.colidx[None], c_loc.vals[None]

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
            out_specs=(P(axis), P(axis), P(axis)),
        )
    )


def dist_spgemm_replicated(
    a: ShardedCSR,
    b: CSR,
    mesh: Mesh,
    prod_cap: int,
    out_cap: int,
    axis: str = "rows",
    chunk_k: int = 8,
) -> ShardedCSR:
    """C = A @ B with A,C row-sharded over ``mesh[axis]`` and B replicated.

    prod_cap/out_cap are per-shard static capacities (use the max over
    shards of the stage-1 bound); local compute is the chunked-ESC core."""
    m, k = a.shape
    n = b.n
    # chunks <= products/k + one partial chunk per stored A entry
    chunks_cap = pad_gentle(prod_cap // chunk_k + a.cap + 1)
    fn = _replicated_exec(
        mesh, axis, a.m_loc, k, n, chunk_k, chunks_cap, out_cap
    )
    rowptr, colidx, vals = fn(
        a.rowptr, a.colidx, a.vals, b.rowptr, b.colidx, b.vals
    )
    return ShardedCSR(rowptr, colidx, vals, (m, n))


# ---------------------------------------------------------------------------
# Ring schedule (B row-sharded, blocks rotate via ppermute)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _ring_exec(mesh, axis, m_loc, k_loc, kdim, n, n_shards, prod_cap, out_cap):
    """Cached compiled ring executable (see _replicated_exec)."""

    def local_fn(a_rp, a_ci, a_va, b_ci, b_va, b_rp_glob):
        my = jax.lax.axis_index(axis)
        a_loc = CSR(a_rp[0], a_ci[0], a_va[0], (m_loc, kdim))
        b_ci0, b_va0 = b_ci[0], b_va[0]

        # per-product destination metadata (independent of ring step);
        # scatter+cumsum entry map, not searchsorted (80x slower on TPU,
        # scripts/micro_bench.py)
        b_len = (b_rp_glob[1:] - b_rp_glob[:-1]).astype(INDEX_DTYPE)
        a_rows = a_loc.row_ids()
        per_nz = jnp.where(a_rows < m_loc, b_len[a_loc.colidx], 0).astype(
            INDEX_DTYPE
        )
        ends = jnp.cumsum(per_nz)
        starts = ends - per_nz
        total = ends[-1]
        t = jnp.arange(prod_cap, dtype=INDEX_DTYPE)
        hits = jnp.zeros(prod_cap, INDEX_DTYPE).at[starts].add(1, mode="drop")
        src = jnp.clip(jnp.cumsum(hits) - 1, 0, a_loc.capacity - 1)
        valid_t = t < total
        inner = t - starts[src]
        bcol = a_loc.colidx[src]  # B row feeding this product
        gpos = b_rp_glob[bcol] + inner  # global position into B's value array
        row_t = jnp.where(valid_t, a_rows[src], m_loc).astype(INDEX_DTYPE)
        aval_t = a_loc.vals[src]

        def step(s, carry):
            bc, bv, out_col, out_val = carry
            blk = (my - s) % n_shards
            blk_row0 = blk * k_loc
            offset = b_rp_glob[blk_row0]
            active = valid_t & (bcol >= blk_row0) & (bcol < blk_row0 + k_loc)
            lp = jnp.clip(gpos - offset, 0, bc.shape[0] - 1)
            out_col = jnp.where(active, bc[lp], out_col)
            out_val = jnp.where(active, aval_t * bv[lp], out_val)
            bc, bv = jax.lax.ppermute(
                (bc, bv),
                axis,
                perm=[(i, (i + 1) % n_shards) for i in range(n_shards)],
            )
            return bc, bv, out_col, out_val

        # pcast: the zero-filled accumulators must be typed as varying over
        # the mesh axis (their step values depend on axis_index).
        init = (
            b_ci0,
            b_va0,
            jax.lax.pcast(jnp.zeros(prod_cap, INDEX_DTYPE), (axis,), to="varying"),
            jax.lax.pcast(jnp.zeros(prod_cap, a_va.dtype), (axis,), to="varying"),
        )
        _, _, col_t, val_t = jax.lax.fori_loop(0, n_shards, step, init)
        val_t = jnp.where(valid_t, val_t, 0)
        c_loc = merge_products(
            row_t, col_t, val_t, m_loc, n, out_cap, val_dtype=a_va.dtype
        )
        return c_loc.rowptr[None], c_loc.colidx[None], c_loc.vals[None]

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis)),
        )
    )


def dist_spgemm_ring(
    a: ShardedCSR,
    b: ShardedCSR,
    b_rowptr_global: jax.Array,
    mesh: Mesh,
    prod_cap: int,
    out_cap: int,
    axis: str = "rows",
) -> ShardedCSR:
    """C = A @ B with both A and B row-sharded; B blocks ride the ring.

    ``b_rowptr_global``: the (k+1,) global B rowptr, replicated (tiny).
    Each device precomputes, for every local intermediate product, its final
    slot and the *global* B value position; during step s it fills the slots
    whose B row lives in the currently-resident block, then rotates the
    block to the right neighbor (compute and ppermute overlap under XLA's
    async collectives).
    """
    m, k = a.shape
    n = b.shape[1]
    fn = _ring_exec(
        mesh, axis, a.m_loc, b.m_loc, k, n, a.n_shards, prod_cap, out_cap
    )
    rowptr, colidx, vals = fn(
        a.rowptr, a.colidx, a.vals, b.colidx, b.vals, b_rowptr_global
    )
    return ShardedCSR(rowptr, colidx, vals, (m, n))


# ---------------------------------------------------------------------------
# Distributed sparse addition (row-sharded, communication-free)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _spadd_exec(mesh, axis, m_loc, n, out_cap, dt):
    """Cached compiled row-sharded C = alpha*A + beta*B executable.

    Addition under a matching 1D row partition needs NO communication:
    every output row depends only on the same row of both operands, so the
    local kernel is the single-chip degenerate sort-merge (max_run=2)."""

    def local_fn(a_rp, a_ci, a_va, b_rp, b_ci, b_va, alpha, beta):
        a_loc = CSR(a_rp[0], a_ci[0], a_va[0], (m_loc, n))
        b_loc = CSR(b_rp[0], b_ci[0], b_va[0], (m_loc, n))
        row = jnp.concatenate([a_loc.row_ids(), b_loc.row_ids()])
        col = jnp.concatenate([a_loc.colidx, b_loc.colidx]).astype(INDEX_DTYPE)
        val = jnp.concatenate(
            [a_loc.vals.astype(dt) * alpha.astype(dt),
             b_loc.vals.astype(dt) * beta.astype(dt)]
        )
        prodstart = jnp.concatenate(
            [jnp.zeros((1,), INDEX_DTYPE),
             jnp.cumsum(a_loc.row_lengths() + b_loc.row_lengths())]
        ).astype(INDEX_DTYPE)
        c_loc = merge_products(
            row.astype(INDEX_DTYPE), col, val, m_loc, n, out_cap,
            max_run=2, val_dtype=dt, prodstart=prodstart,
        )
        return c_loc.rowptr[None], c_loc.colidx[None], c_loc.vals[None]

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis),) * 6 + (P(), P()),
            out_specs=(P(axis), P(axis), P(axis)),
        )
    )


def dist_spadd(
    a: CSR, b: CSR, mesh: Mesh, alpha=1.0, beta=1.0, axis: str = "rows"
) -> CSR:
    """Host-facing distributed C = alpha*A + beta*B: shard rows, local
    merge on every device (no collectives), unshard."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} + {b.shape}")
    n_shards = mesh.shape[axis]
    a_sh = shard_rows(a, n_shards)
    b_sh = shard_rows(b, n_shards)
    if b_sh.m_loc != a_sh.m_loc:  # same m, same shard count -> always equal
        raise AssertionError("row partitions disagree")
    out_cap = pad_bucket(a_sh.cap + b_sh.cap)
    dt = jnp.promote_types(a.dtype, b.dtype)
    fn = _spadd_exec(mesh, axis, a_sh.m_loc, a.n, out_cap, dt)
    rowptr, colidx, vals = fn(
        a_sh.rowptr, a_sh.colidx, a_sh.vals,
        b_sh.rowptr, b_sh.colidx, b_sh.vals,
        jnp.asarray(alpha, dt), jnp.asarray(beta, dt),
    )
    return unshard(ShardedCSR(rowptr, colidx, vals, a.shape))


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def dist_spgemm(
    a: CSR, b: CSR, mesh: Mesh, *, schedule: str = "replicated", axis: str = "rows"
) -> CSR:
    """Host-facing distributed C = A @ B: shard, run, unshard.

    schedule: 'replicated' (B on every device) or 'ring' (B row-sharded,
    ppermute rotation)."""
    n_shards = mesh.shape[axis]
    a_sh = shard_rows(a, n_shards)
    # per-shard stage-1 bound (host): products per shard
    nnz_ct = np.asarray(jax.jit(lambda a_, b_: products_per_nz(a_, b_))(a, b))
    rowptr = np.asarray(a.rowptr)
    m_pad = a_sh.n_shards * a_sh.m_loc
    rowptr_full = np.concatenate(
        [rowptr, np.full(m_pad - a.m, rowptr[-1], rowptr.dtype)]
    )
    bounds = []
    for i in range(n_shards):
        lo = int(rowptr_full[i * a_sh.m_loc])
        hi = int(rowptr_full[(i + 1) * a_sh.m_loc])
        bounds.append(int(nnz_ct[lo:hi].sum()))
    prod_cap = pad_bucket(max(bounds + [1]))
    if schedule == "halo":
        from .halo import spgemm_halo

        return spgemm_halo(a, b, mesh, axis)
    if schedule == "replicated":
        c_sh = dist_spgemm_replicated(a_sh, b, mesh, prod_cap, prod_cap, axis)
    elif schedule == "ring":
        k_pad_shards = n_shards
        b_sh = shard_rows(b, k_pad_shards)
        c_sh = dist_spgemm_ring(
            a_sh, b_sh, b.rowptr, mesh, prod_cap, prod_cap, axis
        )
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    return unshard(c_sh)
