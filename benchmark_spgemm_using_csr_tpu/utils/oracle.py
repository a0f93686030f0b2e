"""Scipy-based golden reference + tolerance-aware CSR comparator.

Plays the role of the reference's built-in serial CPU SpGEMM golden check
(SURVEY.md §6: main.cpp computes a serial product and compares nnzC, column
indices, and values within FP tolerance). BASELINE.json:7 makes the
scipy-checked CSR path acceptance config #1.
"""
from __future__ import annotations

import numpy as np

from ..sparse.csr import CSR


def spgemm_reference(a: CSR, b: CSR):
    """Golden C = A @ B via scipy (canonical: sorted cols, no dup, no
    explicit zeros removed — we keep explicit zeros to match exact nnz
    semantics of merge-based SpGEMM)."""
    sa, sb = a.to_scipy(), b.to_scipy()
    c = (sa @ sb).tocsr()
    c.sum_duplicates()
    c.sort_indices()
    return c


def assert_csr_equal(got: CSR, want, rtol=1e-5, atol=1e-6, check_explicit_zeros=True):
    """Compare a framework CSR against a scipy CSR within FP tolerance.

    Matches the reference's golden-check semantics: nnz, per-row structure,
    column indices, then values with tolerance.  Explicit zeros produced by
    numeric cancellation are structurally legitimate in merge-based SpGEMM;
    scipy keeps them too (it does not prune), so structures should agree
    exactly unless ``check_explicit_zeros=False``, in which case both sides
    are pruned before comparison.
    """
    import scipy.sparse as sp

    got_sp = got.to_scipy()
    got_sp.sum_duplicates()
    got_sp.sort_indices()
    want = want.tocsr()
    want.sum_duplicates()
    want.sort_indices()
    if not check_explicit_zeros:
        got_sp.eliminate_zeros()
        want = want.copy()
        want.eliminate_zeros()
    assert got_sp.shape == want.shape, (got_sp.shape, want.shape)
    np.testing.assert_array_equal(
        got_sp.indptr, want.indptr, err_msg="rowptr mismatch"
    )
    np.testing.assert_array_equal(
        got_sp.indices, want.indices, err_msg="colidx mismatch"
    )
    np.testing.assert_allclose(
        got_sp.data, want.data, rtol=rtol, atol=atol, err_msg="value mismatch"
    )


def random_csr(m, n, density=0.01, dtype=np.float32, seed=0) -> CSR:
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    mat = sp.random(
        m, n, density=density, format="csr", dtype=np.float64, random_state=rng
    )
    mat.data = rng.standard_normal(mat.nnz)
    return CSR.from_scipy(mat.astype(dtype))
