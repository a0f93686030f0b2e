"""Property sweep: random CSR matrices across shapes / densities / regimes,
all production numeric paths vs the scipy oracle (SURVEY.md §6: property
tests sweeping row-size distributions across all bin regimes)."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR, spgemm
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan,
    spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    random_csr,
    spgemm_reference,
)

CASES = []
for seed in (0, 1, 2):
    CASES += [
        ("er", dict(m=257, n=131, nnz_per_row=3.0 + seed, seed=seed)),
        ("powerlaw", dict(m=200, n=200, alpha=1.7 + 0.2 * seed, seed=seed)),
        ("uniform", dict(m=100 + 40 * seed, n=90, density=0.02 * (seed + 1), seed=seed)),
    ]


def _build(kind, p):
    if kind == "er":
        return CSR.from_scipy(
            generators.erdos_renyi(p["m"], p["n"], p["nnz_per_row"], seed=p["seed"])
        )
    if kind == "powerlaw":
        return CSR.from_scipy(
            generators.power_law(p["m"], p["n"], alpha=p["alpha"],
                                 max_deg=p["n"] // 4, seed=p["seed"])
        )
    return random_csr(p["m"], p["n"], density=p["density"], seed=p["seed"])


@pytest.mark.parametrize("kind,params", CASES)
def test_chunked_rectangular_chain(kind, params):
    """A @ B with B an independently-shaped random matrix."""
    a = _build(kind, params)
    b = random_csr(a.n, 173, density=0.05, seed=params["seed"] + 100)
    plan = make_chunked_plan(a, b)
    c = spgemm_chunked(a, b, plan)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_chained_products_match_dense():
    """(A @ A) @ A through the facade equals the dense triple product."""
    a_sp = generators.erdos_renyi(150, 150, 4.0, seed=9)
    a = CSR.from_scipy(a_sp)
    c2 = spgemm(a, a)
    c3 = spgemm(c2, a)
    want = (a_sp @ a_sp @ a_sp).toarray()
    np.testing.assert_allclose(c3.todense(), want, rtol=1e-3, atol=1e-3)


def test_identity_and_permutation():
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 128
    eye = CSR.from_scipy(sp.identity(n, format="csr", dtype=np.float32))
    perm = sp.csr_matrix(
        (np.ones(n, np.float32), (np.arange(n), rng.permutation(n))), shape=(n, n)
    )
    a = CSR.from_scipy(generators.erdos_renyi(n, n, 5.0, seed=4))
    # A @ I == A
    c = spgemm(a, eye)
    assert_csr_equal(c, a.to_scipy(), rtol=1e-6, atol=1e-7)
    # P @ A is a row permutation
    cp = spgemm(CSR.from_scipy(perm), a)
    assert_csr_equal(cp, (perm @ a.to_scipy()).tocsr(), rtol=1e-6, atol=1e-7)
