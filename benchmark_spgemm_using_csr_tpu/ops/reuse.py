"""Structure-reuse numeric SpGEMM — recompute C = A @ B values when the
sparsity structures of A, B (and therefore C) are fixed.

The reference's 4-stage pipeline (SURVEY.md §4 [K]) re-derives C's
structure on every call because the benchmark treats each multiply as
independent. Production workloads that repeat a product on a fixed
pattern — AMG re-coarsening with updated operator values, iterative
refactorization, Jacobian refills on a fixed mesh — only need stage 3
(numeric) once the pattern is known: the cusparse ``spgemm_reuse`` /
MKL two-stage ("numeric phase with known pattern") capability.

TPU-native design: the host plan enumerates the full product stream
(every (A[i,k], B[k,j]) pair) *sorted by destination slot in C*, so the
device pass is completely sort-free and scatter-free:

- two value gathers (``a.vals[a_idx]``, ``b.vals[b_idx]``) build the
  product stream in destination order;
- one segmented associative scan (reset at precomputed segment starts)
  + a gather at the segment tails reduces each C slot's products; the
  log-depth pairwise combine keeps rounding error per-segment (a global
  cumsum-then-diff was measurably outside f32 golden tolerance on
  mixed-sign streams), while scan cost stays far below the
  gather-descriptor wall (CLAUDE.md);
- results land directly in C's final layout: no compaction pass at all.

Everything dynamic is resolved at plan time; the hot call is one jitted
dispatch with static shapes, reusable across any number of value
updates.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.csr import CSR, INDEX_DTYPE, pad_bucket
from .chunked import pad_gentle


@dataclasses.dataclass(frozen=True)
class NumericPlan:
    """Hashable statics for one (A-structure, B-structure) pair."""

    m: int
    n: int
    total: int  # exact intermediate-product count
    nnz_c: int  # exact nnz(C)
    prod_cap: int  # padded product-stream length
    out_cap: int  # padded C capacity


@dataclasses.dataclass
class NumericSchedule:
    """Plan + device arrays: the precomputed product->C mapping."""

    plan: NumericPlan
    a_idx: jax.Array  # (prod_cap,) int32 into a.vals, dest-sorted
    b_idx: jax.Array  # (prod_cap,) int32 into b.vals, dest-sorted
    starts: jax.Array  # (prod_cap,) bool, True at each segment start
    tails: jax.Array  # (out_cap,) int32 exclusive segment ends, pad=total
    rowptr: jax.Array  # (m+1,) C row pointers
    colidx: jax.Array  # (out_cap,) C column indices, pad=0


def make_numeric_plan(a: CSR, b: CSR) -> NumericSchedule:
    """Host symbolic phase: C pattern + dest-ordered product mapping.

    One-time O(total_products log) numpy work; the returned schedule is
    valid for any values placed in the same A/B sparsity structures.
    """
    m, k_dim = a.shape
    k2, n = b.shape
    if k_dim != k2:
        raise ValueError(f"inner dims mismatch: {a.shape} @ {b.shape}")
    a_rowptr = np.asarray(a.rowptr)[: m + 1].astype(np.int64)
    nnz_a = int(a_rowptr[-1])
    a_colidx = np.asarray(a.colidx)[:nnz_a].astype(np.int64)
    b_rowptr = np.asarray(b.rowptr)[: k2 + 1].astype(np.int64)
    nnz_b = int(b_rowptr[-1])
    b_colidx = np.asarray(b.colidx)[:nnz_b].astype(np.int64)

    a_row_of = np.repeat(np.arange(m, dtype=np.int64), np.diff(a_rowptr))
    lens = (b_rowptr[a_colidx + 1] - b_rowptr[a_colidx])  # products per A entry
    total = int(lens.sum())

    # Product stream in natural (A-entry-major) order.
    a_idx_nat = np.repeat(np.arange(nnz_a, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    b_idx_nat = (
        np.arange(total, dtype=np.int64)
        - np.repeat(starts, lens)
        + np.repeat(b_rowptr[a_colidx], lens)
    )
    i_prod = np.repeat(a_row_of, lens)
    j_prod = b_colidx[b_idx_nat]

    # C pattern from the structural product (scipy; canonical sorted cols).
    import scipy.sparse as sp

    pa = sp.csr_matrix(
        (np.ones(nnz_a, np.float64), a_colidx.astype(np.int32), a_rowptr),
        shape=(m, k_dim),
    )
    pb = sp.csr_matrix(
        (np.ones(nnz_b, np.float64), b_colidx.astype(np.int32), b_rowptr),
        shape=(k2, n),
    )
    pc = (pa @ pb).tocsr()
    pc.sort_indices()
    nnz_c = int(pc.nnz)

    # Global (row-major, col-sorted) C keys are strictly increasing, so a
    # single vectorized searchsorted maps every product to its C slot.
    c_row_of = np.repeat(np.arange(m, dtype=np.int64), np.diff(pc.indptr))
    c_key = c_row_of * n + pc.indices.astype(np.int64)
    dest = np.searchsorted(c_key, i_prod * n + j_prod)

    order = np.argsort(dest, kind="stable")
    counts = np.bincount(dest, minlength=nnz_c)
    ends = np.cumsum(counts)

    prod_cap = pad_gentle(max(total, 8))
    out_cap = pad_bucket(max(nnz_c, 8))
    a_idx = np.zeros(prod_cap, np.int32)
    b_idx = np.zeros(prod_cap, np.int32)
    a_idx[:total] = a_idx_nat[order]
    b_idx[:total] = b_idx_nat[order]
    starts = np.ones(prod_cap, bool)  # pad slots: singleton segments
    if total:
        dest_sorted = dest[order]
        starts[1:total] = dest_sorted[1:] != dest_sorted[:-1]
    tails = np.full(out_cap, total, np.int64)  # pad tails masked to zero
    tails[:nnz_c] = ends
    colidx = np.zeros(out_cap, np.int32)
    colidx[:nnz_c] = pc.indices

    plan = NumericPlan(
        m=m, n=n, total=total, nnz_c=nnz_c, prod_cap=prod_cap, out_cap=out_cap
    )
    return NumericSchedule(
        plan=plan,
        a_idx=jnp.asarray(a_idx),
        b_idx=jnp.asarray(b_idx),
        starts=jnp.asarray(starts),
        tails=jnp.asarray(tails, INDEX_DTYPE),
        rowptr=jnp.asarray(pc.indptr, INDEX_DTYPE),
        colidx=jnp.asarray(colidx),
    )


@partial(jax.jit, static_argnames=("plan",))
def _numeric(a_vals, b_vals, a_idx, b_idx, starts, tails, plan: NumericPlan):
    dt = jnp.promote_types(a_vals.dtype, b_vals.dtype)
    valid = jnp.arange(plan.prod_cap, dtype=INDEX_DTYPE) < plan.total
    prod = jnp.where(
        valid, a_vals.astype(dt)[a_idx] * b_vals.astype(dt)[b_idx], 0
    )
    acc = dt if dt != jnp.bfloat16 else jnp.float32

    # Segmented inclusive scan: value carries reset at segment starts, so
    # the element at each segment tail holds that segment's sum.
    def comb(x, y):
        xf, xv = x
        yf, yv = y
        return xf | yf, yv + jnp.where(yf, 0, xv)

    _, s = jax.lax.associative_scan(comb, (starts, prod.astype(acc)))
    seg = s[jnp.maximum(tails - 1, 0)]
    c_valid = jnp.arange(plan.out_cap, dtype=INDEX_DTYPE) < plan.nnz_c
    return jnp.where(c_valid, seg, 0).astype(dt)


def spgemm_numeric(a: CSR, b: CSR, sched: NumericSchedule) -> CSR:
    """Numeric-only C = A @ B on a prebuilt structure plan.

    ``a``/``b`` may carry different values than at plan time but MUST have
    the exact sparsity structures the plan was built from (not checked on
    the hot path). Output structure is bitwise identical across calls.
    """
    c_vals = _numeric(
        a.vals, b.vals, sched.a_idx, sched.b_idx, sched.starts, sched.tails,
        plan=sched.plan,
    )
    return CSR(sched.rowptr, sched.colidx, c_vals, (sched.plan.m, sched.plan.n))
