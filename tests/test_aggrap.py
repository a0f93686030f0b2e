"""ops/aggrap: aggregation-structured Galerkin R·A·P (relabel-and-merge).

Oracle: scipy's own triple product P^T @ (A @ P) — the same golden the
RAP bench point uses (SURVEY.md §6: scipy is the permanent oracle).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu.models.amg import (
    aggregation_prolongator,
)
from benchmark_spgemm_using_csr_tpu.ops.aggrap import (
    make_aggrap_plan,
    rap_aggregation,
)
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR, csr_transpose
from benchmark_spgemm_using_csr_tpu.utils import generators


def _check(a_sp, p_sp):
    a_sp = a_sp.tocsr().astype(np.float32)
    p_sp = p_sp.tocsr().astype(np.float32)
    a = CSR.from_scipy(a_sp)
    p = CSR.from_scipy(p_sp)
    r = CSR.from_scipy(p_sp.T.tocsr())
    sched = make_aggrap_plan(r, a, p)
    assert sched is not None
    got = rap_aggregation(a, sched).to_scipy().tocsr()
    got.sort_indices()
    got.eliminate_zeros()
    want = (p_sp.T @ (a_sp @ p_sp)).tocsr()
    want.sort_indices()
    want.eliminate_zeros()
    assert got.nnz == want.nnz
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data, rtol=1e-4, atol=1e-5)
    return sched


def test_poisson2d_matches_scipy_triple():
    a_sp = generators.poisson2d(32)
    p_sp = aggregation_prolongator(a_sp.tocsr())
    sched = _check(a_sp, p_sp)
    assert sched.plan.nnz_c > 0


def test_er_graph_aggregation():
    # unstructured graph: exercises ragged aggregate sizes + singletons
    a_sp = generators.erdos_renyi(1500, 1500, 6.0, seed=3)
    a_sp = (a_sp + a_sp.T).tocsr()
    p_sp = aggregation_prolongator(a_sp)
    _check(a_sp, p_sp)


def test_weighted_aggregation_values():
    # non-unit P values (smoothed-aggregation-style column scaling)
    rng = np.random.default_rng(0)
    a_sp = generators.poisson2d(24).tocsr()
    p_sp = aggregation_prolongator(a_sp)
    p_sp = p_sp.tocsr()
    p_sp.data = rng.uniform(0.5, 2.0, p_sp.nnz)
    _check(a_sp, p_sp)


def test_non_aggregation_p_returns_none():
    a_sp = generators.poisson2d(16).tocsr().astype(np.float32)
    # two nnz in one P row -> not an aggregation
    n = a_sp.shape[0]
    rows = np.arange(n).tolist() + [0]
    cols = (np.arange(n) // 4).tolist() + [1]
    p_sp = sp.csr_matrix(
        (np.ones(n + 1, np.float32), (rows, cols)), shape=(n, n // 4 + 2)
    )
    a = CSR.from_scipy(a_sp)
    p = CSR.from_scipy(p_sp)
    r = CSR.from_scipy(p_sp.T.tocsr())
    assert make_aggrap_plan(r, a, p) is None


def test_f64_returns_none():
    import jax

    a_sp = generators.poisson2d(16).tocsr()
    p_sp = aggregation_prolongator(a_sp)
    a = CSR.from_scipy(a_sp.astype(np.float32))
    p = CSR.from_scipy(p_sp.tocsr().astype(np.float32))
    r = csr_transpose(p)
    jax.config.update("jax_enable_x64", True)
    try:
        a64 = CSR(a.rowptr, a.colidx, a.vals.astype(jnp.float64), a.shape)
        assert a64.vals.dtype == jnp.float64  # guard the guard
        assert make_aggrap_plan(r, a64, p) is None
    finally:
        jax.config.update("jax_enable_x64", False)


def test_numeric_refresh_rides_aggrap():
    from benchmark_spgemm_using_csr_tpu.models.amg import (
        build_hierarchy, numeric_refresh,
    )

    a_sp = generators.poisson2d(24).tocsr().astype(np.float32)
    # tentative (unsmoothed) P is the aggregation case aggrap covers
    h = build_hierarchy(a_sp, max_levels=3, smooth=False)
    a2_sp = a_sp.copy()
    a2_sp.data = a2_sp.data * 1.5
    h2 = numeric_refresh(h, CSR.from_scipy(a2_sp))
    assert h._triple_plans[1][0] == "agg"
    # refreshed coarse operator matches a from-scratch hierarchy
    h_ref = build_hierarchy(a2_sp, max_levels=3, smooth=False)
    got = h2.levels[1].a.to_scipy().tocsr()
    want = h_ref.levels[1].a.to_scipy().tocsr()
    got.sort_indices(); want.sort_indices()
    got.eliminate_zeros(); want.eliminate_zeros()
    assert got.nnz == want.nnz
    np.testing.assert_allclose(got.data, want.data, rtol=1e-4, atol=1e-5)
