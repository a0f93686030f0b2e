"""Structure-reuse numeric SpGEMM (plan once, recompute values)."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR, make_numeric_plan, spgemm_numeric
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)


@pytest.mark.parametrize(
    "gen",
    [
        lambda: generators.erdos_renyi(200, 180, 6.0, seed=3),
        lambda: generators.power_law(256, 256, alpha=2.0, max_deg=64, seed=7),
        lambda: generators.poisson2d(16),
        lambda: generators.banded(128, bandwidth=5),
    ],
)
def test_numeric_matches_oracle(gen):
    a_sp = gen()
    b_sp = generators.erdos_renyi(a_sp.shape[1], 150, 5.0, seed=11)
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    sched = make_numeric_plan(a, b)
    c = spgemm_numeric(a, b, sched)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_value_update_reuses_plan():
    a_sp = generators.erdos_renyi(300, 300, 7.0, seed=5)
    a = CSR.from_scipy(a_sp)
    sched = make_numeric_plan(a, a)
    assert_csr_equal(spgemm_numeric(a, a, sched), spgemm_reference(a, a),
                     rtol=1e-4, atol=1e-5)

    # new values, same structure: plan must stay valid with no rebuild
    rng = np.random.default_rng(9)
    a2_sp = a_sp.copy()
    a2_sp.data = rng.standard_normal(a2_sp.nnz).astype(np.float32)
    a2 = CSR.from_scipy(a2_sp, capacity=a.capacity)
    assert_csr_equal(spgemm_numeric(a2, a2, sched), spgemm_reference(a2, a2),
                     rtol=1e-4, atol=1e-5)


def test_numeric_empty_rows_and_empty_product():
    import scipy.sparse as sp

    # rows of A hitting only empty B rows -> some empty C rows
    a_sp = sp.csr_matrix(
        (np.array([1.0, 2.0], np.float32), (np.array([0, 3]), np.array([1, 2]))),
        shape=(5, 4),
    )
    b_sp = sp.csr_matrix(
        (np.array([3.0], np.float32), (np.array([1],), np.array([0],))),
        shape=(4, 6),
    )
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    sched = make_numeric_plan(a, b)
    assert_csr_equal(spgemm_numeric(a, b, sched), (a_sp @ b_sp).tocsr(),
                     rtol=1e-6, atol=1e-7)

    # fully structurally-zero product
    b0 = CSR.from_scipy(sp.csr_matrix((4, 6), dtype=np.float32))
    sched0 = make_numeric_plan(a, b0)
    c0 = spgemm_numeric(a, b0, sched0)
    assert int(np.asarray(c0.rowptr)[-1]) == 0


def test_numeric_cumsum_accuracy_large_stream():
    # ~1.3M intermediate products: the segmented-scan reduction must hold
    # strict f32 golden tolerance (a global cumsum+diff did not).
    a_sp = generators.erdos_renyi(2048, 2048, 18.0, seed=13)
    a = CSR.from_scipy(a_sp)
    sched = make_numeric_plan(a, a)
    assert sched.plan.total > 500_000
    assert_csr_equal(spgemm_numeric(a, a, sched), spgemm_reference(a, a),
                     rtol=1e-4, atol=1e-5)


def test_numeric_f64_path():
    import jax

    if not jax.config.jax_enable_x64:
        pytest.skip("x64 covered by the subprocess dtype suite")
    a_sp = generators.poisson2d(12).astype(np.float64)
    a = CSR.from_scipy(a_sp, dtype=np.float64)
    sched = make_numeric_plan(a, a)
    assert_csr_equal(spgemm_numeric(a, a, sched), spgemm_reference(a, a),
                     rtol=1e-12, atol=1e-12)


def test_numeric_dim_mismatch():
    a = CSR.from_scipy(generators.erdos_renyi(10, 11, 2.0, seed=1))
    b = CSR.from_scipy(generators.erdos_renyi(10, 11, 2.0, seed=2))
    with pytest.raises(ValueError, match="inner dims"):
        make_numeric_plan(a, b)
