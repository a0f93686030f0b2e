import jax.numpy as jnp
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import (
    CSR,
    spgemm,
    spgemm_esc_padded,
    spgemm_binned_host,
    spgemm_flops,
    nnz_upper_bound,
    pad_bucket,
)
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    random_csr,
    spgemm_reference,
)
from benchmark_spgemm_using_csr_tpu.utils import generators


MATRICES = {
    "poisson2d": lambda: generators.poisson2d(24),
    "er": lambda: generators.erdos_renyi(300, 300, 6.0, seed=7),
    "powerlaw": lambda: generators.power_law(400, 400, alpha=1.9, max_deg=200, seed=8),
    "banded": lambda: generators.banded(256, bandwidth=3, seed=9),
}


def test_symbolic_upper_bound():
    a = random_csr(64, 48, density=0.1, seed=0)
    b = random_csr(48, 80, density=0.1, seed=1)
    nnz_ct = np.asarray(nnz_upper_bound(a, b))
    sa, sb = a.to_scipy(), b.to_scipy()
    blen = np.diff(sb.indptr)
    want = np.zeros(64, np.int64)
    for i in range(64):
        want[i] = blen[sa.indices[sa.indptr[i] : sa.indptr[i + 1]]].sum()
    np.testing.assert_array_equal(nnz_ct, want)
    assert spgemm_flops(a, b) == 2 * want.sum()


@pytest.mark.parametrize("name", list(MATRICES))
@pytest.mark.parametrize("method", ["esc", "binned"])
def test_spgemm_square_vs_scipy(name, method):
    a = CSR.from_scipy(MATRICES[name]())
    c = spgemm(a, a, method=method)
    want = spgemm_reference(a, a)
    assert_csr_equal(c, want, rtol=1e-4, atol=1e-5)


def test_spgemm_rectangular():
    a = random_csr(60, 90, density=0.08, seed=3)
    b = random_csr(90, 40, density=0.08, seed=4)
    for method in ("esc", "binned"):
        c = spgemm(a, b, method=method)
        assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_spgemm_empty_rows_and_cols():
    import scipy.sparse as sp

    dense = np.zeros((8, 8), np.float32)
    dense[0, 3] = 1.0
    dense[3, 0] = 2.0
    dense[3, 7] = 3.0
    a = CSR.from_scipy(sp.csr_matrix(dense))
    for method in ("esc", "binned"):
        c = spgemm(a, a, method=method)
        assert_csr_equal(c, spgemm_reference(a, a))


def test_spgemm_all_zero():
    import scipy.sparse as sp

    a = CSR.from_scipy(sp.csr_matrix((5, 5), dtype=np.float32), capacity=8)
    c = spgemm(a, a, method="esc")
    assert int(np.asarray(c.rowptr)[-1]) == 0


def test_spgemm_identity():
    import scipy.sparse as sp

    a = CSR.from_scipy(sp.identity(32, np.float32, format="csr"))
    b = random_csr(32, 32, density=0.2, seed=5)
    for method in ("esc", "binned"):
        c = spgemm(a, b, method=method)
        assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-5)


def test_esc_padded_jit_static_shapes():
    a = random_csr(40, 40, density=0.1, seed=6)
    total = int(np.asarray(nnz_upper_bound(a, a)).sum())
    cap = pad_bucket(total)
    c = spgemm_esc_padded(a, a, cap, cap)
    assert c.colidx.shape[0] == cap
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_binned_matches_esc_long_rows():
    # power-law with rows far beyond the largest bin width
    a = CSR.from_scipy(generators.power_law(200, 200, alpha=1.6, max_deg=199, seed=10))
    c1 = spgemm(a, a, method="esc")
    c2 = spgemm(a, a, method="binned")
    assert_csr_equal(c2, c1.to_scipy(), rtol=1e-4, atol=1e-5)


def test_spgemm_values_accumulate_duplicates():
    # A chain that produces many duplicate (row, col) products
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    dense_a = (rng.random((20, 20)) < 0.4).astype(np.float32) * rng.standard_normal(
        (20, 20)
    ).astype(np.float32)
    a = CSR.from_scipy(sp.csr_matrix(dense_a))
    c = spgemm(a, a, method="binned")
    want = dense_a @ dense_a
    np.testing.assert_allclose(c.todense(), want, rtol=1e-4, atol=1e-4)
