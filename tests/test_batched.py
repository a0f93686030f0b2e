"""Row-batched (out-of-core) SpGEMM vs scipy golden."""
import numpy as np

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops.batched import (
    plan_row_batches,
    spgemm_batched,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)


def test_plan_row_batches():
    nnz_ct = np.array([10, 10, 10, 100, 5, 5])
    blocks = plan_row_batches(nnz_ct, 25)
    # contiguous cover of all rows
    assert blocks[0][0] == 0 and blocks[-1][1] == 6
    for (a0, a1), (b0, b1) in zip(blocks, blocks[1:]):
        assert a1 == b0
    for lo, hi in blocks:
        if hi - lo > 1:
            assert nnz_ct[lo:hi].sum() <= 25


def test_batched_matches_unbatched():
    a = CSR.from_scipy(generators.erdos_renyi(400, 400, 6.0, seed=13))
    # force ~8 blocks
    c = spgemm_batched(a, a, stream_budget=2000)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_batched_single_block_fast_path():
    a = CSR.from_scipy(generators.poisson2d(20))
    c = spgemm_batched(a, a)  # fits budget -> plain chunked
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_batched_oversized_single_row():
    import scipy.sparse as sp

    # one dense row whose products alone exceed the budget
    d = np.zeros((64, 64), np.float32)
    d[0, :] = 1.0
    d[:, 0] = 1.0
    np.fill_diagonal(d, 1.0)
    a = CSR.from_dense(d)
    c = spgemm_batched(a, a, stream_budget=100)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
