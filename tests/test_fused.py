"""Single-dispatch fused SpGEMM (plan + one-jit exec) vs scipy golden."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops.fused import make_plan, spgemm_fused
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    random_csr,
    spgemm_reference,
)

MATRICES = {
    "poisson2d": lambda: generators.poisson2d(24),
    "er": lambda: generators.erdos_renyi(300, 300, 6.0, seed=7),
    "powerlaw": lambda: generators.power_law(400, 400, alpha=1.9, max_deg=200, seed=8),
    "banded": lambda: generators.banded(256, bandwidth=3, seed=9),
}


@pytest.mark.parametrize("name", list(MATRICES))
def test_fused_square_vs_scipy(name):
    a = CSR.from_scipy(MATRICES[name]())
    plan = make_plan(a, a)
    c = spgemm_fused(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_fused_rectangular():
    a = random_csr(100, 60, density=0.1, seed=1)
    b = random_csr(60, 140, density=0.08, seed=2)
    plan = make_plan(a, b)
    c = spgemm_fused(a, b, plan)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_fused_plan_reuse_same_profile():
    """Two same-profile matrices share one plan (and one compilation)."""
    a1 = CSR.from_scipy(generators.erdos_renyi(300, 300, 6.0, seed=1))
    a2 = CSR.from_scipy(
        generators.erdos_renyi(300, 300, 6.0, seed=2),
        capacity=a1.capacity,
    )
    plan1, plan2 = make_plan(a1, a1), make_plan(a2, a2)
    if plan1 == plan2:  # bucket-padded profiles usually coincide
        c2 = spgemm_fused(a2, a2, plan1)
        assert_csr_equal(c2, spgemm_reference(a2, a2), rtol=1e-4, atol=1e-5)
    c1 = spgemm_fused(a1, a1, plan1)
    assert_csr_equal(c1, spgemm_reference(a1, a1), rtol=1e-4, atol=1e-5)


def test_fused_empty_and_tail_only():
    import scipy.sparse as sp

    z = CSR.from_scipy(sp.csr_matrix((16, 16), dtype=np.float32))
    plan = make_plan(z, z)
    c = spgemm_fused(z, z, plan)
    assert int(np.asarray(c.rowptr)[-1]) == 0

    # one dense row -> tail bin only
    d = np.zeros((64, 64), np.float32)
    d[0, :] = 1.0
    d[:, 0] = 1.0
    a = CSR.from_dense(d)
    plan = make_plan(a, a)
    c = spgemm_fused(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
