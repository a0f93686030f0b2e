"""Sparse addition (ops/spadd) vs the scipy oracle."""
import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu.ops.spadd import (
    make_add_plan,
    spadd,
    spadd_planned,
)
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils.oracle import assert_csr_equal


def _rand(m, n, density, seed, fmt="csr"):
    rng = np.random.default_rng(seed)
    mat = sp.random(m, n, density=density, random_state=rng, format=fmt,
                    dtype=np.float32)
    mat.sum_duplicates()
    return mat.tocsr()


@pytest.mark.parametrize("m,n,da,db", [
    (64, 64, 0.05, 0.05),
    (200, 130, 0.02, 0.08),
    (1, 1, 1.0, 1.0),
    (128, 128, 0.0, 0.05),   # A empty
    (128, 128, 0.0, 0.0),    # both empty
])
def test_spadd_matches_scipy(m, n, da, db):
    sa = _rand(m, n, da, 1)
    sb = _rand(m, n, db, 2)
    c = spadd(CSR.from_scipy(sa), CSR.from_scipy(sb))
    assert_csr_equal(c, (sa + sb).tocsr())


def test_spadd_alpha_beta():
    sa = _rand(100, 80, 0.05, 3)
    sb = _rand(100, 80, 0.05, 4)
    c = spadd(CSR.from_scipy(sa), CSR.from_scipy(sb), alpha=2.5, beta=-0.5)
    # exact cancellation may leave explicit zeros (structural union);
    # compare with both sides pruned
    assert_csr_equal(c, (2.5 * sa - 0.5 * sb).tocsr(),
                     check_explicit_zeros=False)


def test_spadd_self_doubles():
    sa = _rand(150, 150, 0.04, 5)
    a = CSR.from_scipy(sa)
    c = spadd(a, a)
    assert_csr_equal(c, (sa + sa).tocsr())


def test_spadd_identical_structure_runs_len2():
    # same pattern, different values: every (row, col) is a length-2 run
    sa = _rand(90, 90, 0.06, 6)
    sb = sa.copy()
    sb.data = np.random.default_rng(7).random(sb.nnz).astype(np.float32)
    c = spadd(CSR.from_scipy(sa), CSR.from_scipy(sb))
    assert_csr_equal(c, (sa + sb).tocsr())


def test_spadd_disjoint_structure():
    # interleaved disjoint columns: no duplicates at all
    m = 64
    rows = np.repeat(np.arange(m), 4)
    cols_a = (np.tile(np.arange(4), m) * 2).astype(np.int64)
    cols_b = cols_a + 1
    vals = np.ones(rows.size, np.float32)
    sa = sp.csr_matrix((vals, (rows, cols_a)), shape=(m, 64))
    sb = sp.csr_matrix((2 * vals, (rows, cols_b)), shape=(m, 64))
    c = spadd(CSR.from_scipy(sa), CSR.from_scipy(sb))
    assert_csr_equal(c, (sa + sb).tocsr())


def test_spadd_plan_reuse_and_jit_cache():
    sa = _rand(80, 80, 0.05, 8)
    sb = _rand(80, 80, 0.05, 9)
    a, b = CSR.from_scipy(sa), CSR.from_scipy(sb)
    plan = make_add_plan(a, b)
    c1 = spadd_planned(a, b, plan, 1.0, 1.0)
    c2 = spadd_planned(a, b, plan, 3.0, 2.0)  # same executable, new scalars
    assert_csr_equal(c1, (sa + sb).tocsr())
    assert_csr_equal(c2, (3.0 * sa + 2.0 * sb).tocsr())


def test_spadd_shape_mismatch_raises():
    a = CSR.from_scipy(_rand(10, 10, 0.2, 10))
    b = CSR.from_scipy(_rand(10, 12, 0.2, 11))
    with pytest.raises(ValueError):
        spadd(a, b)


def test_spadd_u32_pack_corner():
    # (m-1, n-1) occupied in both operands with m*n needing the u32 key:
    # exercises merge_products' corner splice through the spadd path
    m = n = 1 << 16
    rows = np.array([0, 5, m - 1, m - 1], np.int64)
    cols = np.array([3, n - 1, 0, n - 1], np.int64)
    sa = sp.csr_matrix(
        (np.arange(1, 5, dtype=np.float32), (rows, cols)), shape=(m, n)
    )
    sb = sp.csr_matrix(
        (np.full(4, 0.5, np.float32), (rows, cols)), shape=(m, n)
    )
    a, b = CSR.from_scipy(sa), CSR.from_scipy(sb)
    plan = make_add_plan(a, b)
    assert plan.pack_u32
    assert_csr_equal(spadd_planned(a, b, plan), (sa + sb).tocsr())
