"""uint32 single-key sort path for (m, n) that miss int31 but fit 32 bits
(ops/chunked merge_products pack_u32 + the plan's sentinel-corner proof)."""
import numpy as np
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan, spgemm_chunked
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)

M = 65536  # misses int31 ((m+1) << 17 overflows) but fits u32 (16+16 bits)


def _sparse_big(seed, nnz=3000, avoid_corner=True):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, M, nnz)
    c = rng.integers(0, M, nnz)
    if avoid_corner:
        c = np.where((r == M - 1) & (c == M - 1), 0, c)
    v = rng.standard_normal(nnz).astype(np.float32)
    a = sp.coo_matrix((v, (r, c)), shape=(M, M)).tocsr()
    a.sum_duplicates()
    return a


def test_u32_enabled_and_correct():
    a = CSR.from_scipy(_sparse_big(0))
    plan = make_chunked_plan(a, a)
    assert plan.pack_u32, "65536^2 without corner product should pack u32"
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a), rtol=1e-4, atol=1e-5
    )


def test_u32_corner_splice():
    """A[m-1, 0] exists and B row 0 contains col n-1: the (m-1, n-1) product
    key collides with the invalid sentinel. pack_u32 stays ENABLED; the
    corner splice reduces those products pre-sort and re-inserts the entry
    post-compaction."""
    rng = np.random.default_rng(1)
    r = np.concatenate([[M - 1], [0], rng.integers(0, M, 500)])
    c = np.concatenate([[0], [M - 1], rng.integers(0, M - 2, 500)])
    v = rng.standard_normal(r.size).astype(np.float32)
    a_sp = sp.coo_matrix((v, (r, c)), shape=(M, M)).tocsr()
    a_sp.sum_duplicates()
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a)
    assert plan.pack_u32
    c_out = spgemm_chunked(a, a, plan)
    assert_csr_equal(c_out, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
    # the corner product (m-1, n-1) must be present and correct
    golden = spgemm_reference(a, a).tocsr()
    assert golden[M - 1, M - 1] != 0


def test_u32_corner_splice_duplicate_corner_products():
    """Multiple A[m-1, :] entries hitting (m-1, n-1) — the corner run-sum
    must add them all, and the last row's other products must survive."""
    rng = np.random.default_rng(4)
    # last row of A has entries in cols {0, 1, 2}; B rows 0,1,2 all contain
    # col n-1 -> three corner products to merge, plus ordinary products
    r = np.concatenate([[M - 1, M - 1, M - 1], rng.integers(0, M - 1, 400)])
    c = np.concatenate([[0, 1, 2], rng.integers(0, M - 2, 400)])
    extra_r = np.array([0, 1, 2, 0, 1])
    extra_c = np.array([M - 1, M - 1, M - 1, 5, 7])
    r = np.concatenate([r, extra_r])
    c = np.concatenate([c, extra_c])
    v = rng.standard_normal(r.size).astype(np.float32)
    a_sp = sp.coo_matrix((v, (r, c)), shape=(M, M)).tocsr()
    a_sp.sum_duplicates()
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a)
    assert plan.pack_u32
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a),
        rtol=1e-4, atol=1e-5,
    )


def test_u32_sort_fallback_compact():
    a = CSR.from_scipy(_sparse_big(2))
    plan = make_chunked_plan(a, a)
    from benchmark_spgemm_using_csr_tpu.ops.chunked import (
        _expand_chunks,
        merge_products,
    )

    row, col, val = _expand_chunks(a, a, plan.k, plan.chunks_cap)
    c1 = merge_products(row, col, val, M, M, plan.out_cap, plan.max_run,
                        pack_u32=True, compact="sort")
    c2 = merge_products(row, col, val, M, M, plan.out_cap, plan.max_run,
                        pack_u32=False)
    assert_csr_equal(c1, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
    assert_csr_equal(c2, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
