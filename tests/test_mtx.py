import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu.utils.mtx import (
    MTXFormatError,
    _read_mtx_numpy,
    read_mtx,
    write_mtx,
)
from benchmark_spgemm_using_csr_tpu.utils import generators


def test_roundtrip_general(tmp_path):
    mat = generators.erdos_renyi(50, 40, 5.0, seed=1)
    p = str(tmp_path / "a.mtx")
    write_mtx(p, mat)
    back = read_mtx(p, dtype=np.float64)
    assert (abs(back - mat.astype(np.float64))).max() < 1e-12


def test_symmetric_expansion(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% comment line\n")
        f.write("3 3 4\n1 1 2.0\n2 1 5.0\n3 2 7.0\n3 3 1.0\n")
    mat = read_mtx(p, dtype=np.float64)
    dense = np.asarray(mat.todense())
    want = np.array([[2, 5, 0], [5, 0, 7], [0, 7, 1]], np.float64)
    np.testing.assert_allclose(dense, want)


def test_skew_symmetric(tmp_path):
    p = str(tmp_path / "k.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        f.write("3 3 2\n2 1 4.0\n3 1 -2.0\n")
    dense = np.asarray(read_mtx(p, dtype=np.float64).todense())
    want = np.array([[0, -4, 2], [4, 0, 0], [-2, 0, 0]], np.float64)
    np.testing.assert_allclose(dense, want)


def test_pattern_synthesizes_values(tmp_path):
    p = str(tmp_path / "p.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("2 2 2\n1 2\n2 1\n")
    mat = read_mtx(p, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(mat.todense()), [[0, 1], [1, 0]])


def test_bad_banner(tmp_path):
    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as f:
        f.write("not a banner\n1 1 0\n")
    with pytest.raises(MTXFormatError):
        _read_mtx_numpy(p)


def test_native_matches_numpy(tmp_path):
    from benchmark_spgemm_using_csr_tpu.native import mtxparse

    mat = generators.power_law(80, 80, alpha=2.0, max_deg=40, seed=2)
    p = str(tmp_path / "n.mtx")
    write_mtx(p, mat)
    out = mtxparse.read_mtx(p)
    if out is None:
        pytest.skip("native parser unavailable")
    rows, cols, vals, shape = out
    got = sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()
    want = _read_mtx_numpy(p, dtype=np.float64)
    assert (abs(got - want)).max() < 1e-12
