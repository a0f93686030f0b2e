"""Chunked-ESC (slice-gather + sort-merge) SpGEMM vs scipy golden."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops.chunked import (
    make_chunked_plan,
    spgemm_chunked,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    random_csr,
    spgemm_reference,
)

MATRICES = {
    "poisson2d": lambda: generators.poisson2d(24),
    "er": lambda: generators.erdos_renyi(300, 300, 6.0, seed=7),
    "powerlaw": lambda: generators.power_law(400, 400, alpha=1.9, max_deg=200, seed=8),
    "banded": lambda: generators.banded(256, bandwidth=3, seed=9),
}


@pytest.mark.parametrize("name", list(MATRICES))
def test_chunked_square_vs_scipy(name):
    a = CSR.from_scipy(MATRICES[name]())
    plan = make_chunked_plan(a, a)
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k", [4, 8, 32])
def test_chunked_various_k(k):
    a = CSR.from_scipy(generators.power_law(256, 256, alpha=1.9, max_deg=100, seed=3))
    plan = make_chunked_plan(a, a, k=k)
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_chunked_rectangular():
    a = random_csr(100, 60, density=0.1, seed=1)
    b = random_csr(60, 140, density=0.08, seed=2)
    plan = make_chunked_plan(a, b)
    c = spgemm_chunked(a, b, plan)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_chunked_empty_and_single():
    import scipy.sparse as sp

    z = CSR.from_scipy(sp.csr_matrix((16, 16), dtype=np.float32))
    plan = make_chunked_plan(z, z)
    c = spgemm_chunked(z, z, plan)
    assert int(np.asarray(c.rowptr)[-1]) == 0

    s = sp.csr_matrix(([2.0], ([1], [2])), shape=(4, 4)).astype(np.float32)
    a = CSR.from_scipy(s)
    plan = make_chunked_plan(a, a)
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-6, atol=1e-7)


def test_chunked_empty_rows_mixed():
    import scipy.sparse as sp

    rng = np.random.default_rng(4)
    a_sp = sp.random(128, 128, density=0.05, random_state=42, format="csr").astype(
        np.float32
    )
    a_sp[30:60, :] = 0
    a_sp.eliminate_zeros()
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a)
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", list(MATRICES))
@pytest.mark.parametrize("al", [2, 8])
def test_chunked_aligned_expansion(name, al):
    """Explicit al forces the aligned packed-table row-gather expansion."""
    a = CSR.from_scipy(MATRICES[name]())
    plan = make_chunked_plan(a, a, al=al)
    assert plan.al == al and plan.abpad_cap % al == 0
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_chunked_aligned_rectangular():
    a = random_csr(100, 60, density=0.1, seed=1)
    b = random_csr(60, 140, density=0.08, seed=2)
    plan = make_chunked_plan(a, b, al=8)
    c = spgemm_chunked(a, b, plan)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_chunked_aligned_with_wide_path():
    """Aligned short-row expansion composes with the wide long-row path."""
    a = CSR.from_scipy(
        generators.power_law(400, 400, alpha=1.7, max_deg=300, seed=11)
    )
    plan = make_chunked_plan(a, a, al=8, wide_min=64)
    assert plan.al == 8 and plan.wide_min == 64 and plan.wchunks_cap > 0
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", list(MATRICES))
def test_chunked_mixed_mode(name):
    """al_min splits expansion: B rows len < al_min narrow, rest aligned."""
    a = CSR.from_scipy(MATRICES[name]())
    plan = make_chunked_plan(a, a, al=8, al_min=5)
    assert plan.al == 8 and plan.al_min == 5 and plan.nchunks_cap > 0
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_chunked_mixed_with_wide():
    """All three substreams (narrow + aligned + wide) in one pipeline."""
    a = CSR.from_scipy(
        generators.power_law(400, 400, alpha=1.7, max_deg=300, seed=11)
    )
    plan = make_chunked_plan(a, a, al=8, al_min=5, wide_min=64)
    assert plan.al_min == 5 and plan.wide_min == 64 and plan.wchunks_cap > 0
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_chunked_auto_plan_powerlaw_mixed_correct():
    """Whatever the cost model picks for a power-law mix must be correct."""
    a = CSR.from_scipy(
        generators.power_law(2048, 2048, alpha=2.0, max_deg=256, seed=5)
    )
    plan = make_chunked_plan(a, a)
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_chunked_aligned_bf16():
    import jax.numpy as jnp

    a = CSR.from_scipy(MATRICES["er"]())
    a = CSR(a.rowptr, a.colidx, a.vals.astype(jnp.bfloat16), a.shape)
    plan = make_chunked_plan(a, a, al=8)
    c = spgemm_chunked(a, a, plan)
    assert c.vals.dtype == jnp.bfloat16
    assert_csr_equal(c, spgemm_reference(a, a), rtol=5e-2, atol=5e-2)


def test_disp_bits_bound_high_duplication():
    """disp_bits (plan-time exact duplicate count) must bound the shift
    compaction even when nearly every product is a duplicate (poisson
    squaring collapses ~7x products -> nnzC)."""
    mat = generators.poisson2d(20)
    a = CSR.from_scipy(mat)
    plan = make_chunked_plan(a, a)
    assert plan.disp_bits > 0  # small matrix: exact bound always computed
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a))


def test_disp_bits_zero_duplicates_minimal_passes():
    """A permutation-matrix square has zero duplicate products; the exact
    bound collapses to the 1-pass floor and must still be correct."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n = 64
    perm = rng.permutation(n)
    mat = sp.csr_matrix(
        (np.ones(n, np.float32), (np.arange(n), perm)), shape=(n, n)
    )
    a = CSR.from_scipy(mat)
    plan = make_chunked_plan(a, a)
    assert plan.disp_bits == 1
    c = spgemm_chunked(a, a, plan)
    assert_csr_equal(c, spgemm_reference(a, a))


def test_chunked_scan_tail_mode():
    """ChunkedPlan.tail_mode='scan' must match shift compaction exactly on
    the packed-key branches (int31 + u32) and fall back safely unpacked."""
    import dataclasses

    from benchmark_spgemm_using_csr_tpu.ops.chunked import (
        make_chunked_plan,
        spgemm_chunked,
    )
    from benchmark_spgemm_using_csr_tpu.utils.oracle import (
        assert_csr_equal,
        spgemm_reference,
    )

    for a_sp in (
        generators.erdos_renyi(500, 500, 7.0, seed=2),     # int31 pack
        generators.power_law(400, 400, alpha=1.9, max_deg=96, seed=3),
    ):
        a = CSR.from_scipy(a_sp)
        plan = make_chunked_plan(a, a)
        plan_s = dataclasses.replace(plan, tail_mode="scan")
        c = spgemm_chunked(a, a, plan_s)
        assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_chunked_scan_tail_u32_branch():
    """Force the uint32 single-key branch (m, n miss int31 but fit 32 bits)
    under the scan tail."""
    import dataclasses

    import scipy.sparse as sp

    from benchmark_spgemm_using_csr_tpu.ops.chunked import (
        make_chunked_plan,
        spgemm_chunked,
    )
    from benchmark_spgemm_using_csr_tpu.utils.oracle import (
        assert_csr_equal,
        spgemm_reference,
    )

    m = 1 << 16  # 65536 x 65536: rbits+cbits = 32 -> pack_u32
    rng = np.random.default_rng(0)
    rows = rng.integers(0, m, 4000)
    cols = rng.integers(0, m, 4000)
    a_sp = sp.coo_matrix(
        (rng.standard_normal(4000).astype(np.float32), (rows, cols)),
        shape=(m, m),
    ).tocsr()
    a_sp.sum_duplicates()
    a = CSR.from_scipy(a_sp)
    plan = make_chunked_plan(a, a)
    assert plan.pack_u32, "expected the u32 branch"
    plan_s = dataclasses.replace(plan, tail_mode="scan")
    c = spgemm_chunked(a, a, plan_s)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
