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


# ---------------------------------------------------------------------------
# fused Galerkin triple product (round 4, VERDICT r3 next #5)
# ---------------------------------------------------------------------------


def _triple_case(n_grid=16, seed=3):
    import scipy.sparse as sp

    from benchmark_spgemm_using_csr_tpu.models.amg import (
        aggregation_prolongator,
    )

    a_sp = generators.poisson2d(n_grid).tocsr().astype(np.float32)
    rng = np.random.default_rng(seed)
    a_sp.data = a_sp.data + 0.01 * rng.standard_normal(a_sp.nnz).astype(
        np.float32
    )
    p_sp = aggregation_prolongator(a_sp).astype(np.float32).tocsr()
    r_sp = p_sp.T.tocsr()
    return a_sp, p_sp, r_sp


def test_triple_matches_chained_oracle():
    from benchmark_spgemm_using_csr_tpu.ops.reuse import (
        make_triple_plan,
        spgemm_triple,
    )

    a_sp, p_sp, r_sp = _triple_case()
    a, p, r = map(CSR.from_scipy, (a_sp, p_sp, r_sp))
    sched = make_triple_plan(r, a, p)
    assert sched is not None
    got = spgemm_triple(r, a, p, sched)
    want = (r_sp @ (a_sp @ p_sp)).tocsr()
    want.sort_indices()
    assert_csr_equal(got, want, rtol=1e-4, atol=1e-5)
    # aggregation P/R: the fused stream is exactly the A@P product count
    assert sched.plan.total == int(
        np.diff(p_sp.indptr)[a_sp.indices].sum()
    )


def test_triple_general_rectangular_values_update():
    """Non-aggregation R (multiple nnz per column) exercises the cartesian
    expansion; a values-only update must reuse the plan."""
    from benchmark_spgemm_using_csr_tpu.ops.reuse import (
        make_triple_plan,
        spgemm_triple,
    )

    rng = np.random.default_rng(11)
    r_sp = generators.erdos_renyi(40, 60, 3.0, seed=1)
    a_sp = generators.erdos_renyi(60, 50, 4.0, seed=2)
    p_sp = generators.erdos_renyi(50, 30, 3.0, seed=3)
    r, a, p = map(CSR.from_scipy, (r_sp, a_sp, p_sp))
    sched = make_triple_plan(r, a, p)
    assert sched is not None
    want = (r_sp @ (a_sp @ p_sp)).tocsr()
    want.sort_indices()
    assert_csr_equal(spgemm_triple(r, a, p, sched), want, rtol=1e-4,
                     atol=1e-5)

    a2_sp = a_sp.copy()
    a2_sp.data = rng.standard_normal(a2_sp.nnz).astype(np.float32)
    a2 = CSR.from_scipy(a2_sp, capacity=a.capacity)
    want2 = (r_sp @ (a2_sp @ p_sp)).tocsr()
    want2.sort_indices()
    assert_csr_equal(spgemm_triple(r, a2, p, sched), want2, rtol=1e-4,
                     atol=1e-5)


def test_amg_numeric_refresh():
    """Hierarchy rebuild for new fine-grid values rides the cached fused
    triple plans and matches a from-scratch hierarchy's coarse operators."""
    from benchmark_spgemm_using_csr_tpu.models import amg

    a_sp, _, _ = _triple_case(n_grid=20)
    h = amg.build_hierarchy(a_sp, max_levels=3, smooth=False)
    assert len(h.levels) >= 2

    rng = np.random.default_rng(5)
    a2_sp = a_sp.copy()
    a2_sp.data = (a2_sp.data + 0.05 * rng.standard_normal(a2_sp.nnz)).astype(
        np.float32
    )
    h2 = amg.numeric_refresh(h, CSR.from_scipy(a2_sp))
    assert h2._triple_plans[1] is not None  # fused plan actually used
    # oracle: recompute each coarse level with scipy using the SAME P/R
    cur = a2_sp
    for li in range(1, len(h.levels)):
        p_sp = h.levels[li].p.to_scipy().tocsr()
        r_sp = h.levels[li].r.to_scipy().tocsr()
        want = (r_sp @ (cur @ p_sp)).tocsr()
        want.sort_indices()
        assert_csr_equal(h2.levels[li].a, want, rtol=1e-4, atol=1e-4)
        cur = want

    # second refresh hits the cached plans (no rebuild)
    plans_before = list(h2._triple_plans)
    h3 = amg.numeric_refresh(h2, CSR.from_scipy(a2_sp))
    assert all(x is y for x, y in zip(h3._triple_plans, plans_before))
