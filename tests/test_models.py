import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.models import amg, ilu0
from benchmark_spgemm_using_csr_tpu.utils import generators


def test_galerkin_product_matches_scipy():
    a_sp = generators.poisson2d(12)
    p_sp = amg.aggregation_prolongator(a_sp)
    a = CSR.from_scipy(a_sp)
    p = CSR.from_scipy(p_sp)
    a_c = amg.galerkin_product(a, p)
    want = (p_sp.T @ a_sp @ p_sp).tocsr()
    want.sum_duplicates()
    want.sort_indices()
    got = a_c.to_scipy()
    got.eliminate_zeros()
    want.eliminate_zeros()
    assert (abs(got - want)).max() < 1e-4


def test_amg_hierarchy_coarsens():
    a_sp = generators.poisson2d(16)
    h = amg.build_hierarchy(a_sp, min_coarse=16)
    sizes = [lv.a.m for lv in h.levels]
    assert len(sizes) >= 2
    assert all(sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1))


def test_amg_vcycle_converges():
    a_sp = generators.poisson2d(16).astype(np.float32)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a_sp.shape[0]).astype(np.float32)
    x, hist = amg.solve(a_sp, b, tol=1e-4, max_iters=40)
    assert hist[-1] < 1e-4, hist[-5:]
    # true residual
    r = np.linalg.norm(b - a_sp @ x) / np.linalg.norm(b)
    assert r < 1e-3


def test_amg_hierarchy_save_load(tmp_path):
    a_sp = generators.poisson2d(8)
    h = amg.build_hierarchy(a_sp, min_coarse=8)
    prefix = str(tmp_path / "h")
    h.save(prefix)
    h2 = amg.AMGHierarchy.load(prefix, len(h.levels))
    assert h2.levels[0].a.m == h.levels[0].a.m


def test_ilu0_poisson():
    a_sp = generators.poisson2d(10).astype(np.float64)
    a = CSR.from_scipy(a_sp)
    f = ilu0.ilu0(a, sweeps=20)
    res = ilu0.ilu0_residual_on_pattern(a, f)
    assert res < 5e-6, res  # f32 on device (x64 off in tests)


def test_ilu0_matches_exact_on_tridiag():
    # tridiagonal: ILU0 == exact LU; compare against scipy's dense LU
    n = 32
    a_sp = sp.diags(
        [np.full(n, 4.0), np.full(n - 1, -1.0), np.full(n - 1, -1.0)],
        [0, 1, -1],
        format="csr",
    ).astype(np.float64)
    a = CSR.from_scipy(a_sp)
    f = ilu0.ilu0(a, sweeps=30)
    l, u = ilu0.split_lu(f)
    err = abs((l @ u - a_sp)).max()
    assert err < 1e-5, err  # f32 on device (x64 off in tests)


def test_ilu0_preconditioner_improves_cg():
    # sanity: ILU0-preconditioned residual smaller than unpreconditioned
    a_sp = generators.poisson2d(8).astype(np.float64)
    a = CSR.from_scipy(a_sp)
    f = ilu0.ilu0(a, sweeps=15)
    l, u = ilu0.split_lu(f)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(a_sp.shape[0])
    from scipy.sparse.linalg import spsolve_triangular

    y = spsolve_triangular(l, b, lower=True, unit_diagonal=True)
    x = spsolve_triangular(u, y, lower=False)
    assert np.linalg.norm(b - a_sp @ x) < 0.5 * np.linalg.norm(b)
