"""Exact-nnz symbolic variant + profiling helpers."""
import numpy as np

from benchmark_spgemm_using_csr_tpu import CSR, pad_bucket, spgemm_flops
from benchmark_spgemm_using_csr_tpu.ops.symbolic import nnz_exact
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import spgemm_reference


def test_nnz_exact_matches_scipy():
    a = CSR.from_scipy(generators.erdos_renyi(200, 200, 6.0, seed=5))
    cap = pad_bucket(spgemm_flops(a, a) // 2)
    got = np.asarray(nnz_exact(a, a, cap))
    want = np.diff(spgemm_reference(a, a).indptr)
    np.testing.assert_array_equal(got, want)


def test_nnz_exact_le_upper_bound():
    from benchmark_spgemm_using_csr_tpu import nnz_upper_bound

    a = CSR.from_scipy(generators.power_law(256, 256, alpha=1.9, max_deg=100, seed=6))
    cap = pad_bucket(spgemm_flops(a, a) // 2)
    exact = np.asarray(nnz_exact(a, a, cap))
    ub = np.asarray(nnz_upper_bound(a, a))
    assert (exact <= ub).all()


def test_stage_timer():
    from benchmark_spgemm_using_csr_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("x"):
        sum(range(1000))
    assert "x" in t.report() and t.report()["x"] >= 0
