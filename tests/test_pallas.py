"""Pallas fused sort+compress kernel tests, run in interpreter mode on CPU
(SURVEY.md §7.2: interpreter-mode runs catch logic/OOB errors without TPU)."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu.ops.pallas_kernels import bin_sort_compress


def _golden(col, val, n):
    """Per-row sorted-unique merge, numpy reference."""
    r, w = col.shape
    cols_out = []
    vals_out = []
    counts = np.zeros(r, np.int32)
    for i in range(r):
        mask = col[i] < n
        c, inv = np.unique(col[i][mask], return_inverse=True)
        v = np.zeros(len(c), val.dtype)
        np.add.at(v, inv, val[i][mask])
        cols_out.append(c)
        vals_out.append(v)
        counts[i] = len(c)
    return cols_out, vals_out, counts


@pytest.mark.parametrize("width", [8, 32, 128])
@pytest.mark.parametrize("seed", [0, 1])
def test_sort_compress_vs_numpy(width, seed):
    rng = np.random.default_rng(seed)
    r, n = 16, 50
    lens = rng.integers(0, width + 1, size=r)
    col = np.full((r, width), n, np.int32)
    val = np.zeros((r, width), np.float32)
    for i in range(r):
        col[i, : lens[i]] = rng.integers(0, n, size=lens[i])
        val[i, : lens[i]] = rng.standard_normal(lens[i]).astype(np.float32)

    ocol, oval, pos, cnt = bin_sort_compress(
        col, val, n_sentinel=n, interpret=True
    )
    ocol, oval, pos, cnt = map(np.asarray, (ocol, oval, pos, cnt))

    gcols, gvals, gcnt = _golden(col, val, n)
    np.testing.assert_array_equal(cnt, gcnt)
    for i in range(r):
        tails = pos[i] < width
        got_pos = pos[i][tails]
        order = np.argsort(got_pos)
        np.testing.assert_array_equal(np.sort(got_pos), np.arange(gcnt[i]))
        np.testing.assert_array_equal(ocol[i][tails][order], gcols[i])
        np.testing.assert_allclose(oval[i][tails][order], gvals[i], rtol=1e-5, atol=1e-6)


def test_all_duplicates_one_column():
    r, w, n = 8, 16, 10
    col = np.full((r, w), 3, np.int32)
    val = np.ones((r, w), np.float32)
    ocol, oval, pos, cnt = bin_sort_compress(col, val, n_sentinel=n, interpret=True)
    assert np.all(np.asarray(cnt) == 1)
    tails = np.asarray(pos) < w
    assert np.all(np.asarray(oval)[tails] == w)


def test_empty_rows():
    r, w, n = 8, 8, 10
    col = np.full((r, w), n, np.int32)
    val = np.zeros((r, w), np.float32)
    _, _, pos, cnt = bin_sort_compress(col, val, n_sentinel=n, interpret=True)
    assert np.all(np.asarray(cnt) == 0)
    assert np.all(np.asarray(pos) == w)
