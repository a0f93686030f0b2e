"""Exact level-scheduled SpTRSV (ops/sptrsv) vs scipy triangular solves."""
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve_triangular

from benchmark_spgemm_using_csr_tpu.native.levels import csr_levels
from benchmark_spgemm_using_csr_tpu.ops.sptrsv import (
    ilu0_apply_exact,
    make_trsv_plan,
    sptrsv,
    sptrsv_planned,
)
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR


def _lower(m, density, seed, diag=2.0):
    rng = np.random.default_rng(seed)
    a = sp.random(m, m, density=density, random_state=rng, format="csr",
                  dtype=np.float64)
    a = sp.tril(a, k=-1).tocsr() + diag * sp.identity(m, format="csr")
    a.sort_indices()
    return a


def test_levels_native_matches_python(monkeypatch):
    a = _lower(200, 0.05, 0)
    rp, ci = a.indptr.astype(np.int32), a.indices.astype(np.int32)
    got = csr_levels(rp, ci, 200, upper=False)
    import benchmark_spgemm_using_csr_tpu.native.levels as L
    monkeypatch.setattr(L, "_load", lambda: None)
    want = L.csr_levels(rp, ci, 200, upper=False)
    np.testing.assert_array_equal(got, want)


def test_levels_chain_is_sequential():
    # bidiagonal: row i depends on i-1 -> level i
    m = 50
    a = (sp.identity(m) + sp.diags(np.ones(m - 1), -1)).tocsr()
    lev = csr_levels(a.indptr.astype(np.int32), a.indices.astype(np.int32),
                     m, upper=False)
    np.testing.assert_array_equal(lev, np.arange(m))


@pytest.mark.parametrize("m,density", [(64, 0.1), (300, 0.02), (257, 0.05)])
def test_sptrsv_lower(m, density):
    a = _lower(m, density, m).astype(np.float32)
    b = np.random.default_rng(1).random(m).astype(np.float32)
    x = sptrsv(CSR.from_scipy(a), b)
    want = spsolve_triangular(a.tocsc(), b, lower=True)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-5)


def test_sptrsv_upper():
    a = _lower(200, 0.03, 3).T.tocsr().astype(np.float32)
    a.sort_indices()
    b = np.random.default_rng(2).random(200).astype(np.float32)
    x = sptrsv(CSR.from_scipy(a), b, lower=False)
    want = spsolve_triangular(a.tocsc(), b, lower=False)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-5)


def test_sptrsv_unit_diag_strict_lower():
    # no stored diagonal at all: only solvable with unit_diag
    m = 120
    a = sp.tril(
        sp.random(m, m, density=0.04, random_state=np.random.default_rng(4),
                  format="csr", dtype=np.float32), k=-1
    ).tocsr()
    b = np.random.default_rng(5).random(m).astype(np.float32)
    x = sptrsv(CSR.from_scipy(a), b, unit_diag=True)
    full = (a + sp.identity(m, np.float32, format="csr")).tocsc()
    want = spsolve_triangular(full, b, lower=True, unit_diagonal=True)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-5)


def test_sptrsv_ignores_other_triangle():
    # combined LU storage: solving lower must ignore the upper entries
    m = 150
    low = _lower(m, 0.03, 6).astype(np.float32)
    up = sp.triu(
        sp.random(m, m, density=0.03, random_state=np.random.default_rng(7),
                  format="csr", dtype=np.float32), k=1
    )
    combined = (low + up).tocsr()
    combined.sort_indices()
    b = np.random.default_rng(8).random(m).astype(np.float32)
    x = sptrsv(CSR.from_scipy(combined), b, lower=True)
    want = spsolve_triangular(low.tocsc(), b, lower=True)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-5)


def test_sptrsv_multi_rhs():
    m, k = 90, 5
    a = _lower(m, 0.05, 9).astype(np.float32)
    b = np.random.default_rng(10).random((m, k)).astype(np.float32)
    x = sptrsv(CSR.from_scipy(a), b)
    for j in range(k):
        want = spsolve_triangular(a.tocsc(), b[:, j], lower=True)
        np.testing.assert_allclose(np.asarray(x)[:, j], want, rtol=2e-4,
                                   atol=2e-5)


def test_sptrsv_sequential_chain():
    # worst case: m levels of width 1 (bidiagonal)
    m = 80
    a = (2 * sp.identity(m) + sp.diags(np.ones(m - 1), -1)).tocsr()
    a = a.astype(np.float32)
    b = np.arange(1, m + 1, dtype=np.float32)
    sched = make_trsv_plan(CSR.from_scipy(a))
    assert sched.plan.n_levels == m
    x = sptrsv_planned(CSR.from_scipy(a), b, sched)
    want = spsolve_triangular(a.tocsc(), b, lower=True)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-5)


def test_sptrsv_schedule_reuse_new_values():
    a1 = _lower(100, 0.05, 11).astype(np.float32)
    a2 = a1.copy()
    a2.data = a2.data + np.float32(0.5)  # same structure, new values
    A1, A2 = CSR.from_scipy(a1), CSR.from_scipy(a2)
    sched = make_trsv_plan(A1)
    b = np.random.default_rng(12).random(100).astype(np.float32)
    x2 = sptrsv_planned(A2, b, sched)
    want = spsolve_triangular(a2.tocsc(), b, lower=True)
    np.testing.assert_allclose(np.asarray(x2), want, rtol=2e-4, atol=2e-5)


def test_sptrsv_missing_diag_raises():
    m = 30
    a = sp.tril(
        sp.random(m, m, density=0.2, random_state=np.random.default_rng(13),
                  format="csr", dtype=np.float32), k=-1
    ).tocsr()
    with pytest.raises(ValueError, match="no\\s+stored diagonal|singular"):
        make_trsv_plan(CSR.from_scipy(a))


def test_sptrsv_zero_diag_raises():
    a = _lower(20, 0.1, 14, diag=1.0).astype(np.float32)
    i = a.indptr[5]  # zero out one diagonal entry
    row5 = a.indices[a.indptr[5]:a.indptr[6]]
    a.data[a.indptr[5] + int(np.flatnonzero(row5 == 5)[0])] = 0.0
    with pytest.raises(ValueError, match="singular"):
        make_trsv_plan(CSR.from_scipy(a))


def test_sptrsv_rect_raises():
    a = sp.random(10, 12, density=0.3, format="csr", dtype=np.float32)
    with pytest.raises(ValueError, match="square"):
        make_trsv_plan(CSR.from_scipy(a))


def test_ilu0_apply_exact_solves_lu():
    from benchmark_spgemm_using_csr_tpu.models.ilu0 import ilu0, split_lu

    rng = np.random.default_rng(15)
    m = 100
    a = sp.random(m, m, density=0.05, random_state=rng, format="csr",
                  dtype=np.float64)
    a = (a + a.T + 10 * sp.identity(m)).tocsr().astype(np.float32)
    A = CSR.from_scipy(a)
    f = ilu0(A, sweeps=20)
    r = rng.random(m).astype(np.float32)
    z = ilu0_apply_exact(f, r)
    l, u = split_lu(f)
    y = spsolve_triangular(l.tocsc(), r, lower=True, unit_diagonal=True)
    want = spsolve_triangular(u.tocsc(), y, lower=False)
    np.testing.assert_allclose(np.asarray(z), want, rtol=1e-3, atol=1e-4)


def test_sptrsv_f64():
    import jax

    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    a = _lower(100, 0.05, 16)
    b = np.random.default_rng(17).random(100)
    x = sptrsv(CSR.from_scipy(a), b)
    want = spsolve_triangular(a.tocsc(), b, lower=True)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-12)
