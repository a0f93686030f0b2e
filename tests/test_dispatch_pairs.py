"""A != B cost-model dispatch (VERDICT r2 missing #1): the general product
C = A @ B must ride the same measured dispatcher as the reference's
C = A @ A squaring mode (SURVEY.md §4 stage 2's binning decision), so the
AMG Galerkin chain A@P / R@(AP) (models/amg.py, acceptance config #3)
reaches the tuned backends."""
import numpy as np
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu.api import spgemm
from benchmark_spgemm_using_csr_tpu.ops import dispatch
from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import assert_csr_equal


def _pair(m, k, n, da=0.02, db=0.02, seed=0):
    a_sp = sp.random(m, k, density=da, format="csr",
                     random_state=seed, dtype=np.float32)
    b_sp = sp.random(k, n, density=db, format="csr",
                     random_state=seed + 1, dtype=np.float32)
    return a_sp, b_sp


def test_choose_method_accepts_pair():
    a_sp, b_sp = _pair(300, 200, 150)
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    m = dispatch.choose_method(a, b)
    assert m in {"chunked", "bsr", "dia", "dense", "tilepack",
                 "grouped", "hash"}
    # all estimators must run on the pair without error and order sanely
    for est in (dispatch.estimate_chunked_s, dispatch.estimate_grouped_s,
                dispatch.estimate_tilepack_s, dispatch.estimate_dia_s,
                dispatch.estimate_dense_s, dispatch.estimate_bsr_s,
                dispatch.estimate_hash_s):
        v = est(a, b)
        assert v >= 0 or v == float("inf")


def test_pair_products_uses_b_rows():
    """The intermediate-product count must come from B's row lengths at
    A's column indices — not A's own (the r2 dispatcher only modeled A@A)."""
    a_sp = sp.csr_matrix(
        (np.ones(2, np.float32), ([0, 1], [0, 1])), shape=(2, 2)
    )
    # B row 0 has 5 entries, row 1 has 1
    b_sp = sp.csr_matrix(np.vstack([
        np.ones((1, 6), np.float32) * [1, 1, 1, 1, 1, 0],
        np.eye(1, 6, 5, dtype=np.float32),
    ]))
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    *_, products = dispatch._stats(a, b)
    assert products == 6  # 5 (row 0) + 1 (row 1)
    *_, products_aa = dispatch._stats(a)
    assert products_aa == 2


def test_spgemm_auto_rectangular_oracle():
    a_sp, b_sp = _pair(400, 300, 200, seed=3)
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    c = spgemm(a, b)  # method='auto' by default config
    assert_csr_equal(c, (a_sp @ b_sp).tocsr())


def test_spgemm_auto_tall_skinny_prolongator():
    """AMG-shaped: sparse square A times piecewise-constant tall-skinny P."""
    a_sp = generators.poisson2d(32).tocsr().astype(np.float32)
    n = a_sp.shape[0]
    agg = np.arange(n) // 4
    p_sp = sp.csr_matrix(
        (np.ones(n, np.float32), (np.arange(n), agg)), shape=(n, n // 4)
    )
    a, p = CSR.from_scipy(a_sp), CSR.from_scipy(p_sp)
    ap = spgemm(a, p)
    assert_csr_equal(ap, (a_sp @ p_sp).tocsr())
    r_sp = p_sp.T.tocsr()
    rap = spgemm(CSR.from_scipy(r_sp), ap)
    assert_csr_equal(rap, (r_sp @ (a_sp @ p_sp)).tocsr())


def test_forced_backends_rectangular_oracle():
    """Every pair-capable backend must be correct on a rectangular product
    when forced (the dispatcher may legitimately never pick some)."""
    a_sp, b_sp = _pair(256, 384, 128, da=0.03, db=0.03, seed=7)
    a, b = CSR.from_scipy(a_sp), CSR.from_scipy(b_sp)
    want = (a_sp @ b_sp).tocsr()
    for method in ("chunked", "grouped", "esc", "hash"):
        c = spgemm(a, b, method=method)
        assert_csr_equal(c, want), method


def test_dia_term_cap_guards_compile_time():
    """A tall-skinny aggregation P has O(m) distinct diagonals; the DIA
    estimate must reject pairs whose term count would unroll into a
    minutes-to-compile XLA graph (poisson2d(48): P has 1729 distinct
    diagonals -> 5 * 1729 = 8645 slice-FMA terms, over the 8192 cap)."""
    a_sp = generators.poisson2d(48).tocsr().astype(np.float32)
    m = a_sp.shape[0]
    agg = np.arange(m) // 4
    p_sp = sp.csr_matrix(
        (np.ones(m, np.float32), (np.arange(m), agg)), shape=(m, m // 4)
    )
    a, p = CSR.from_scipy(a_sp), CSR.from_scipy(p_sp)
    assert dispatch.estimate_dia_s(a, p) == float("inf")


def test_amg_hierarchy_routes_through_dispatcher(monkeypatch):
    """build_hierarchy's Galerkin products must consult choose_method(a, b)
    — the r2 code hardcoded chunked for any A != B."""
    calls = []
    orig = dispatch.choose_method

    def spy(a, b=None):
        m = orig(a, b)
        calls.append((a.shape, (a if b is None else b).shape, m))
        return m

    monkeypatch.setattr(dispatch, "choose_method", spy)
    from benchmark_spgemm_using_csr_tpu.models import amg

    a_sp = generators.poisson2d(16).tocsr().astype(np.float32)
    h = amg.build_hierarchy(a_sp, max_levels=2, smooth=False)
    assert len(h.levels) == 2
    rect = [c for c in calls if c[0] != c[1]]
    assert rect, "no rectangular product consulted the dispatcher"
