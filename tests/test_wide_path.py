"""Wide-row (long B row) expansion path: 128-lane aligned fetches from a
padded B copy (ops/chunked._expand_wide)."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan, spgemm_chunked
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)


def test_wide_enabled_for_circuit():
    a = CSR.from_scipy(generators.circuit(2048, seed=3))
    plan = make_chunked_plan(a, a)
    assert plan.wide_min > 0 and plan.wchunks_cap > 0
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a), rtol=1e-4, atol=1e-4
    )


def test_forced_wide_small_threshold():
    """Force a tiny threshold so most entries take the wide path."""
    a = CSR.from_scipy(generators.erdos_renyi(512, 512, 12.0, seed=7))
    plan = make_chunked_plan(a, a, wide_min=8)
    assert plan.wide_min == 8 and plan.wchunks_cap > 0
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a), rtol=1e-4, atol=1e-5
    )


def test_wide_disabled_explicitly():
    a = CSR.from_scipy(generators.circuit(2048, seed=3))
    plan = make_chunked_plan(a, a, wide_min=0)
    assert plan.wide_min == 0 and plan.wchunks_cap == 0
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a), rtol=1e-4, atol=1e-4
    )


def test_wide_f64():
    """f64 takes the gather (non-propagated) a_val fallback in both paths."""
    import jax

    if not jax.config.read("jax_enable_x64"):
        pytest.skip("x64 disabled")
    a_sp = generators.circuit(1024, seed=1).astype(np.float64)
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a, wide_min=16)
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a), rtol=1e-12, atol=1e-12
    )


def test_wide_row_at_capacity_boundary():
    """A long B row ending exactly at nnz == capacity must not be clipped."""
    rng = np.random.default_rng(0)
    import scipy.sparse as sp

    n = 256
    # one dense row at the end + scattered short rows referencing it
    rows = [np.full(n, n - 1)]
    cols = [np.arange(n)]
    short_r = rng.integers(0, n - 1, 64)
    rows.append(short_r)
    cols.append(np.full(64, n - 1))  # entries pointing at the dense row
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = rng.standard_normal(r.size).astype(np.float32)
    a_sp = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    a_sp.sum_duplicates()
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a, wide_min=32)
    assert plan.wchunks_cap > 0
    assert_csr_equal(
        spgemm_chunked(a, a, plan), spgemm_reference(a, a), rtol=1e-4, atol=1e-5
    )
