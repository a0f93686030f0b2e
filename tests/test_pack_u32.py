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


def test_u32_disabled_when_corner_product_exists():
    """A[m-1, 0] exists and B row 0 contains col n-1: the (m-1, n-1) product
    key would collide with the invalid sentinel, so the plan must fall back
    to the 2-key sort — and still be correct."""
    rng = np.random.default_rng(1)
    r = np.concatenate([[M - 1], [0], rng.integers(0, M, 500)])
    c = np.concatenate([[0], [M - 1], rng.integers(0, M - 2, 500)])
    v = rng.standard_normal(r.size).astype(np.float32)
    a_sp = sp.coo_matrix((v, (r, c)), shape=(M, M)).tocsr()
    a_sp.sum_duplicates()
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a)
    assert not plan.pack_u32
    c_out = spgemm_chunked(a, a, plan)
    assert_csr_equal(c_out, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
    # the corner product (m-1, n-1) must be present and correct
    golden = spgemm_reference(a, a).tocsr()
    assert golden[M - 1, M - 1] != 0


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
