import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu import CSR, COO, BSR, csr_transpose, csr_gather_rows
from benchmark_spgemm_using_csr_tpu.utils.oracle import random_csr
from benchmark_spgemm_using_csr_tpu.utils import generators


def test_csr_scipy_roundtrip():
    a = random_csr(100, 80, density=0.05, seed=1)
    sa = a.to_scipy()
    b = CSR.from_scipy(sa)
    np.testing.assert_array_equal(np.asarray(a.rowptr), np.asarray(b.rowptr))
    assert int(a.nnz) == sa.nnz


def test_row_ids_with_padding_and_empty_rows():
    mat = sp.csr_matrix(
        np.array([[1.0, 0, 2.0], [0, 0, 0], [0, 3.0, 0], [0, 0, 0]], np.float32)
    )
    a = CSR.from_scipy(mat, capacity=8)
    rid = np.asarray(a.row_ids())
    np.testing.assert_array_equal(rid[:3], [0, 0, 2])
    assert (rid[3:] == 4).all()  # padding -> sentinel m


def test_row_ids_full_capacity():
    mat = sp.csr_matrix(np.eye(4, dtype=np.float32))
    a = CSR.from_scipy(mat, capacity=4)  # no padding at all
    np.testing.assert_array_equal(np.asarray(a.row_ids()), [0, 1, 2, 3])


def test_coo_to_csr_jit_with_duplicates():
    row = [2, 0, 0, 2, 1]
    col = [1, 3, 3, 1, 0]
    val = [1.0, 2.0, 3.0, 4.0, 5.0]
    coo = COO.from_arrays(row, col, val, shape=(3, 4), capacity=8)
    csr = jax.jit(lambda c: c.to_csr(sum_duplicates=True))(coo)
    want = sp.coo_matrix((val, (row, col)), shape=(3, 4)).tocsr()
    want.sum_duplicates()
    got = csr.to_scipy()
    got.sum_duplicates()
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data)


def test_transpose():
    a = random_csr(50, 70, density=0.08, seed=2)
    at = csr_transpose(a)
    want = a.to_scipy().T.tocsr()
    want.sort_indices()
    got = at.to_scipy()
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data, rtol=1e-6)


def test_gather_rows():
    a = random_csr(64, 32, density=0.1, seed=3)
    rows = jnp.asarray(np.array([5, 0, 63, 64, 64], np.int32))  # padded w/ m
    sub = csr_gather_rows(a, rows, nnz_capacity=64)
    want = a.to_scipy()[np.array([5, 0, 63]), :]
    got = sub.to_scipy()[:3, :]
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data)
    assert np.asarray(sub.rowptr)[4] == np.asarray(sub.rowptr)[3]


def test_bsr_roundtrip():
    mat = generators.poisson2d(16)
    b = BSR.from_scipy(mat, block_shape=(8, 8))
    back = b.to_scipy().tocsr()
    back.eliminate_zeros()
    want = mat.copy()
    want.eliminate_zeros()
    assert (abs(back - want)).nnz == 0


def test_save_load(tmp_path):
    a = random_csr(30, 30, density=0.1, seed=4)
    p = str(tmp_path / "a.npz")
    a.save(p)
    b = CSR.load(p)
    np.testing.assert_array_equal(np.asarray(a.colidx), np.asarray(b.colidx))


def test_generators_shapes():
    for name, f in generators.SUITE.items():
        if any(s in name for s in
               ("medium", "16k", "256", "8k", "1m", "206k", "524k")):
            continue  # keep unit tests fast
        mat = f()
        assert mat.nnz > 0, name
