"""Grouped-ESC SpGEMM (ops/grouped.py) vs the scipy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.ops.grouped import (
    make_grouped_plan,
    spgemm_grouped,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)


def _run(a_sp, b_sp=None, al=None, target_slots=None, rtol=1e-5):
    a = CSR.from_scipy(a_sp)
    b = a if b_sp is None else CSR.from_scipy(b_sp)
    sched = make_grouped_plan(a, b, al=al, target_slots=target_slots)
    assert sched is not None
    c = spgemm_grouped(a, b, sched)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=rtol, atol=1e-6)
    return sched


@pytest.mark.parametrize("al", [0, 8, None])
def test_er_square(al):
    a = generators.erdos_renyi(400, 400, 6.0, seed=1)
    _run(a, al=al)


@pytest.mark.parametrize("al", [0, 8])
def test_powerlaw_square(al):
    a = generators.power_law(600, 600, alpha=1.8, max_deg=200, seed=3)
    _run(a, al=al)


def test_rectangular():
    rng = np.random.default_rng(7)
    a = sp.random(300, 500, 0.02, format="csr", random_state=rng)
    b = sp.random(500, 250, 0.03, format="csr", random_state=rng)
    _run(a, b)


def test_small_groups_force_many():
    # tiny target_slots forces many groups; rows straddle nothing
    a = generators.erdos_renyi(200, 200, 5.0, seed=11)
    sched = _run(a, target_slots=64)
    assert sched.plan.g_cap > 4


def test_empty_rows_and_columns():
    a_sp = sp.csr_matrix(
        (np.ones(4), ([0, 0, 4, 9], [0, 4, 4, 9])), shape=(10, 10)
    )
    _run(a_sp)


def test_no_products_returns_none():
    # entries exist but every referenced B row is empty -> zero products
    a_sp = sp.csr_matrix(
        (np.ones(3), ([0, 4, 9], [1, 1, 3])), shape=(10, 10)
    )
    a = CSR.from_scipy(a_sp)
    assert make_grouped_plan(a, a) is None


def test_all_zero():
    a_sp = sp.csr_matrix((5, 5))
    a = CSR.from_scipy(a_sp)
    assert make_grouped_plan(a, a) is None  # regime gate: no products


def test_zero_length_b_rows_scatter_set_dummies():
    # many entries point at empty B rows -> dummy chunks exercise both
    # scatter modes
    rng = np.random.default_rng(5)
    a = sp.random(300, 300, 0.03, format="csr", random_state=rng)
    b = sp.random(300, 300, 0.01, format="csr", random_state=rng)
    _run(a.tocsr(), b.tocsr(), al=0)
    _run(a.tocsr(), b.tocsr(), al=8)


def test_single_giant_row():
    # one row holds most products: the greedy must give it its own group
    rng = np.random.default_rng(13)
    a = sp.random(128, 128, 0.05, format="csr", random_state=rng).tolil()
    a[0, :] = 1.0
    _run(a.tocsr())


def test_bf16_values():
    a = generators.erdos_renyi(256, 256, 4.0, seed=2)
    ac = CSR.from_scipy(a, dtype=jnp.bfloat16)
    sched = make_grouped_plan(ac, ac)
    assert sched is not None
    c = spgemm_grouped(ac, ac, sched)
    ref = spgemm_reference(ac, ac)
    assert_csr_equal(c, ref, rtol=5e-2, atol=5e-2)


def test_f64_rejected():
    # without x64 the dtype coerces to f32, so fake the dtype gate directly
    a = generators.erdos_renyi(64, 64, 4.0, seed=2)
    ac = CSR.from_scipy(a)
    ic = CSR(ac.rowptr, ac.colidx, ac.vals.astype(jnp.int32), ac.shape)
    assert make_grouped_plan(ic, ic) is None


def test_duplicate_heavy():
    # dense-ish square: many duplicate (row, col) products per run
    rng = np.random.default_rng(17)
    a = sp.random(120, 120, 0.25, format="csr", random_state=rng)
    _run(a, rtol=1e-4)


def test_key_bit_cap_large_n():
    # n forces cbits high; rows-per-group cap must keep keys < sentinel
    rng = np.random.default_rng(19)
    a = sp.random(200, 1 << 20, 40 / (1 << 20), format="csr",
                  random_state=rng)
    b = sp.random(1 << 20, 300, 40 / (1 << 20), format="csr",
                  random_state=rng)
    _run(a, b)


def test_grouped_scan_tail_mode():
    """Fused block-scan runsum+compaction (ops/scancompact) must match the
    shift-compaction path exactly on every regime it claims."""
    for a_sp in (
        generators.erdos_renyi(600, 600, 7.0, seed=3),
        generators.power_law(500, 500, alpha=1.9, max_deg=128, seed=4),
        generators.circuit(512, seed=5),
    ):
        a = CSR.from_scipy(a_sp)
        sched = make_grouped_plan(a, a, tail_mode="scan")
        assert sched is not None and sched.plan.tail_mode == "scan"
        c = spgemm_grouped(a, a, sched)
        assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_grouped_al_2_and_4():
    """Intermediate table alignments (al sweep widened r3): the aligned
    machinery must be correct at any al, not just 8."""
    a = CSR.from_scipy(generators.power_law(400, 400, alpha=2.0,
                                            max_deg=64, seed=7))
    want = spgemm_reference(a, a)
    for al in (2, 4):
        sched = make_grouped_plan(a, a, al=al)
        assert sched is not None and sched.plan.al == al
        c = spgemm_grouped(a, a, sched)
        assert_csr_equal(c, want, rtol=1e-4, atol=1e-5)
