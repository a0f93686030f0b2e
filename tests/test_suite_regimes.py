"""New reference-suite regime analogues (stencil27 / circuit / dense_rows)
stay correct through the auto-dispatched facade and the chunked core."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR, make_chunked_plan, spgemm, spgemm_chunked
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)

CASES = {
    "stencil27": lambda: generators.stencil27(8),
    "circuit": lambda: generators.circuit(2048, seed=3),
    "dense_rows": lambda: generators.dense_rows(256, 256, nnz_per_row=32, seed=1),
    "fem": lambda: generators.fem(6, dof=3, fill=0.7, seed=3),
    "fem_irregular": lambda: generators.fem_irregular(6, dof=3, fill=0.7, seed=3),
    # round-5 breadth (small sizes of the road / small-world regimes)
    "road_net": lambda: generators.road_net(48, seed=13),
    "small_world": lambda: generators.small_world(2048, k=4, seed=14),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_facade_auto(name):
    a = CSR.from_scipy(CASES[name]())
    assert_csr_equal(spgemm(a, a), spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", sorted(CASES))
def test_chunked(name):
    a = CSR.from_scipy(CASES[name]())
    c = spgemm_chunked(a, a, make_chunked_plan(a, a))
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_profiles_match_regimes():
    """Generators hit the row-length regimes they claim (guards the suite's
    bin coverage story, SURVEY.md §4 stage 2)."""
    st = generators.stencil27(8)
    assert int(np.diff(st.indptr).max()) == 27
    ci = generators.circuit(2048, seed=3)
    lens = np.diff(ci.indptr)
    assert np.percentile(lens, 50) <= 8  # short-row bulk
    assert lens.max() >= 256  # dense rail rows
    dr = generators.dense_rows(256, 256, nnz_per_row=32, seed=1)
    assert np.percentile(np.diff(dr.indptr), 10) >= 16  # uniformly long


def test_fem_irregular_destroys_diagonal_structure():
    """fem_irregular keeps fem's row-length band but has far too many
    distinct diagonals for the DIA path (the regular fem's ~99-diagonal
    structure routed it to DIA in round 4 — this variant must keep the
    mid-row ESC regime covered)."""
    reg = generators.fem(8, dof=3, fill=0.7, seed=3)
    irr = generators.fem_irregular(8, dof=3, fill=0.7, seed=3)
    assert reg.shape == irr.shape
    # same nnz scale (permutation preserves the degree distribution)
    assert 0.5 < irr.nnz / reg.nnz < 2.0

    def ndiag(m):
        coo = m.tocoo()
        return len(np.unique(coo.col.astype(np.int64) - coo.row))

    nd_reg, nd_irr = ndiag(reg), ndiag(irr)
    assert nd_reg < 200  # the DIA-exploitable structure
    assert nd_irr > 5 * nd_reg  # permutation destroyed it

    from benchmark_spgemm_using_csr_tpu.ops import dispatch

    a = CSR.from_scipy(generators.fem_irregular(10, dof=3, seed=1))
    assert dispatch.estimate_dia_s(a, a) == float("inf")


def test_pattern_mtx_roundtrip_and_hub_rows():
    """Round-4 suite points: the pattern-mtx writer/reader round-trip
    synthesizes unit values with the exact structure, and hub_rows carries
    an explicit heavy-row band."""
    m = generators.pattern_mtx_roundtrip(512, seed=3)
    ref = generators.circuit(512, seed=3)
    assert m.shape == ref.shape and m.nnz == ref.nnz
    np.testing.assert_array_equal(m.indices, ref.indices)
    np.testing.assert_array_equal(m.indptr, ref.indptr)
    assert (m.data == 1.0).all()  # values synthesized

    h = generators.hub_rows(2048, 2048, max_deg=512, n_hubs=4, seed=1)
    lens = np.diff(h.indptr)
    assert (lens >= 400).sum() >= 4  # the hub band exists
    assert np.percentile(lens, 50) < 64  # body stays power-law-short


def test_road_and_smallworld_regimes():
    """Round-5 points hit their claimed regimes: road = ultra-short rows
    (mean ~3-4 nnz), symmetric, NOT diagonal-regular (permuted); small
    world = ~2k+1 nnz rows with rewired links scattering the offsets."""
    rd = generators.road_net(64, seed=13).tocsr()
    mean_deg = rd.nnz / rd.shape[0]
    assert 2.0 < mean_deg < 5.0, mean_deg
    assert ((rd != 0) != (rd.T != 0)).nnz == 0  # structurally symmetric
    co = rd.tocoo()
    n_offsets = np.unique(co.col - co.row).size
    assert n_offsets > rd.shape[0] // 4  # permutation killed the bands

    sw = generators.small_world(2048, k=4, rewire=0.1, seed=14).tocsr()
    mean_deg = sw.nnz / sw.shape[0]
    assert 7.0 < mean_deg < 10.5, mean_deg
    assert ((sw != 0) != (sw.T != 0)).nnz == 0  # structurally symmetric
    co = sw.tocoo()
    n_offsets = np.unique((co.col - co.row) % sw.shape[0]).size
    assert n_offsets > 100  # rewiring scatters offsets (DIA-infeasible)
