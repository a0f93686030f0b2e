"""Dense-MXU SpGEMM for small high-fill matrices — scatter, matmul, extract.

When C = A @ B is nearly structurally dense (mouse_gene / dense_rows regime,
SURVEY.md §8: every row hundreds of nnz, fill of C ~1), the reference's
merge kernels and our sort-based paths pay per-product irregular-memory cost
for structure that is almost all-ones. The TPU-native answer is to put the
FLOPs where the hardware wants them — the MXU:

  1. scatter CSR values into dense operand tiles (one collision-free
     scatter-SET per matrix, ~nnz descriptors — cheap at this regime's nnz),
  2. one dense matmul (`precision=HIGHEST` to hold f32 golden tolerances,
     CLAUDE.md),
  3. extract C's values at the *static* structural positions computed at
     plan time, via the fused ONE-PASS block-scan compaction
     (ops/scancompact with plan-constant keys: flat slot index where
     kept, sentinel where hole, max_run=1 so the run-merge is a no-op) —
     ~2 stream passes instead of the log2(holes) ~ 22 shift passes the
     round-3 _shift_compact tail paid (VERDICT r4 weak #4: the scan tail
     was never ported to dense extraction).

Unlike the BSR/DIA format paths, the output matches the scalar paths'
structural semantics exactly: the plan's rowptr/colidx are the boolean
pattern product (what merge-based SpGEMM produces), so entries that
numerically cancel stay as explicit zeros, same as scipy's golden
(utils/oracle.spgemm_reference).

Reference analogue: the merge-method bin of stage 3 (SURVEY.md §4) at its
densest extreme; dispatch decided by the measured cost model in
ops/dispatch.choose_method.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.csr import CSR, pad_bucket


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensePlan:
    """Static structural plan for the dense-MXU path.

    rowptr/colidx: C's structural CSR pattern (pattern product, host-built).
    ckeys: per dense-C-slot uint32 compaction key — the flat slot index at
    kept (structural) slots, the all-ones sentinel at holes — feeding the
    one-pass scan compaction (4 B/slot, vs the 5 B/slot kept+disp pair the
    shift tail carried).
    """

    rowptr: jax.Array
    colidx: jax.Array
    ckeys: jax.Array
    nnz_c: int = dataclasses.field(metadata=dict(static=True))
    cap_c: int = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))


def make_dense_plan(a: CSR, b: CSR) -> DensePlan:
    """Host symbolic pass: boolean pattern product -> static structure."""
    import scipy.sparse as sp

    sa = a.to_scipy()
    sb = b.to_scipy()
    pat_a = sp.csr_matrix(
        (np.ones(sa.nnz, np.float64), sa.indices, sa.indptr), shape=sa.shape
    )
    pat_b = sp.csr_matrix(
        (np.ones(sb.nnz, np.float64), sb.indices, sb.indptr), shape=sb.shape
    )
    pat_c = (pat_a @ pat_b).tocsr()
    pat_c.sort_indices()
    m, n = pat_c.shape
    nnz_c = int(pat_c.nnz)
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(pat_c.indptr))
    flat = rows * n + pat_c.indices.astype(np.int64)
    ckeys = np.full(m * n, np.uint32(0xFFFFFFFF), np.uint32)
    ckeys[flat] = flat.astype(np.uint32)  # m*n < 2^32 gated by dispatch
    cap_c = pad_bucket(nnz_c)
    rowptr = jnp.asarray(pat_c.indptr.astype(np.int32))
    colidx = np.zeros(cap_c, np.int32)
    colidx[:nnz_c] = pat_c.indices
    return DensePlan(
        rowptr=rowptr,
        colidx=jnp.asarray(colidx),
        ckeys=jnp.asarray(ckeys),
        nnz_c=nnz_c,
        cap_c=cap_c,
        shape=(m, n),
    )


def csr_to_dense(a: CSR) -> jax.Array:
    """Collision-free scatter-SET densification (padding slots write 0 to
    the (m, 0) sentinel cell of an extra guard row, then sliced off)."""
    rows = a.row_ids()  # padding -> m
    dense = jnp.zeros((a.m + 1, a.n), a.vals.dtype)
    dense = dense.at[rows, a.colidx].set(a.vals, mode="drop")
    return dense[: a.m]


def spgemm_dense(a: CSR, b: CSR, plan: DensePlan) -> CSR:
    """C = A @ B on the MXU (jit-able). Structure comes from the plan; only
    values are computed on device."""
    da = csr_to_dense(a)
    # C = A @ A squaring: trace one densification scatter, not two (XLA CSE
    # dedupes the identical scatter anyway — measured no-op — but the single
    # trace keeps the HLO smaller)
    db = da if b is a else csr_to_dense(b)
    cd = jnp.matmul(da, db, precision=jax.lax.Precision.HIGHEST)
    vals = cd.reshape(-1)
    if plan.nnz_c < vals.shape[0]:
        from .scancompact import runsum_compact_scan

        # one-pass scan compaction on plan-constant keys; max_run=1 makes
        # the segmented run-sum a structural no-op (all runs singleton)
        _, vals, _ = runsum_compact_scan(
            plan.ckeys, vals, w=vals.shape[0], out_cap=plan.cap_c,
            max_run=1,
        )
    pad = plan.cap_c - vals.shape[0]
    if pad > 0:
        vals = jnp.concatenate([vals, jnp.zeros(pad, vals.dtype)])
    vals = vals[: plan.cap_c]
    vals = jnp.where(
        jnp.arange(plan.cap_c) < plan.nnz_c, vals, jnp.zeros((), vals.dtype)
    )
    return CSR(plan.rowptr, plan.colidx, vals, plan.shape)


def spgemm_dense_auto(a: CSR, b: CSR) -> CSR:
    """Host-facing convenience wrapper (plan built per call)."""
    return spgemm_dense(a, b, make_dense_plan(a, b))
