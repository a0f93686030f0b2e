"""bhsparse-compatible facade lifecycle test (reference API parity)."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu.compat import BhSparse
from benchmark_spgemm_using_csr_tpu.utils import generators


def test_bhsparse_lifecycle():
    a = generators.erdos_renyi(200, 200, 5.0, seed=3)
    h = BhSparse()
    assert h.init_platform()
    h.init_data(
        200, 200, 200,
        a.indptr, a.indices, a.data,
        a.indptr, a.indices, a.data,
    )
    h.spgemm()
    want = (a @ a).tocsr()
    want.sum_duplicates()
    want.sort_indices()
    assert h.get_nnz_c() == want.nnz
    rowptr, colidx, vals = h.get_c()
    np.testing.assert_array_equal(rowptr, want.indptr)
    np.testing.assert_array_equal(colidx, want.indices)
    np.testing.assert_allclose(vals, want.data, rtol=1e-4, atol=1e-5)
    h.free_mem()
    with pytest.raises(RuntimeError):
        h.get_nnz_c()


def test_bhsparse_order_errors():
    h = BhSparse()
    with pytest.raises(RuntimeError):
        h.spgemm()
