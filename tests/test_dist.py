import jax
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.parallel.dist import (
    dist_spgemm,
    make_mesh,
    shard_rows,
    unshard,
)
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    random_csr,
    spgemm_reference,
)


def test_shard_unshard_roundtrip(eight_devices):
    a = random_csr(100, 64, density=0.08, seed=0)  # m not divisible by 8
    sh = shard_rows(a, 8)
    back = unshard(sh)
    want = a.to_scipy()
    got = back.to_scipy()
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data)


@pytest.mark.parametrize("schedule", ["replicated", "ring"])
def test_dist_spgemm_square(eight_devices, schedule):
    mesh = make_mesh(8)
    a = CSR.from_scipy(generators.erdos_renyi(257, 257, 5.0, seed=3))
    c = dist_spgemm(a, a, mesh, schedule=schedule)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("schedule", ["replicated", "ring"])
def test_dist_spgemm_rectangular(eight_devices, schedule):
    mesh = make_mesh(8)
    a = random_csr(120, 90, density=0.07, seed=4)
    b = random_csr(90, 150, density=0.07, seed=5)
    c = dist_spgemm(a, b, mesh, schedule=schedule)
    assert_csr_equal(c, spgemm_reference(a, b), rtol=1e-4, atol=1e-5)


def test_dist_spgemm_powerlaw_ring(eight_devices):
    mesh = make_mesh(8)
    a = CSR.from_scipy(generators.power_law(300, 300, alpha=1.8, max_deg=128, seed=6))
    c = dist_spgemm(a, a, mesh, schedule="ring")
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_balanced_bounds_shard_roundtrip(eight_devices):
    """Product-balanced non-uniform partition (round 4, VERDICT r3 #4):
    shard/unshard round-trips and boundaries equalize products."""
    from benchmark_spgemm_using_csr_tpu.parallel.dist import (
        balanced_row_bounds,
    )

    a = CSR.from_scipy(
        generators.power_law(300, 300, alpha=1.8, max_deg=128, seed=6)
    )
    bounds = balanced_row_bounds(a, a, 8)
    assert bounds[0] == 0 and bounds[-1] == a.m
    assert (np.diff(bounds) >= 0).all()
    sh = shard_rows(a, 8, bounds=bounds)
    assert sh.bounds == tuple(int(x) for x in bounds)
    back = unshard(sh)
    want, got = a.to_scipy(), back.to_scipy()
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data)
    # per-shard products within 2x of the mean (skewed input, 300 rows)
    b_len = np.diff(np.asarray(a.rowptr))[: a.m]
    prod_row = np.zeros(a.m, np.int64)
    nnz = int(np.asarray(a.rowptr)[-1])
    rows = np.repeat(np.arange(a.m), b_len)
    np.add.at(prod_row, rows,
              b_len[np.asarray(a.colidx)[:nnz]])
    per = np.add.reduceat(prod_row, bounds[:-1].astype(np.int64).clip(0, a.m - 1))
    assert per.max() <= max(2.0 * per.mean(), prod_row.max())


def test_dist_balanced_partition_all_schedules(eight_devices):
    """All three schedules stay correct under product-balanced bounds."""
    from benchmark_spgemm_using_csr_tpu.parallel import dist as D
    from benchmark_spgemm_using_csr_tpu.parallel.halo import (
        build_halo_plan, dist_spgemm_halo,
    )

    mesh = make_mesh(8)
    a = CSR.from_scipy(
        generators.power_law(300, 300, alpha=1.8, max_deg=128, seed=6)
    )
    want = spgemm_reference(a, a)
    bounds = D.balanced_row_bounds(a, a, 8)

    a_sh = D.shard_rows(a, 8, bounds=bounds)
    lp = D.make_dist_local_plan(a, a, 8, bounds=bounds)
    c = unshard(D.dist_spgemm_replicated(a_sh, a, mesh, plan=lp))
    assert_csr_equal(c, want, rtol=1e-4, atol=1e-5)

    b_sh = D.shard_rows(a, 8)
    # every hop width: 1 (fine ring), 2 (the dist_spgemm default at
    # P=8), 4, and 8 (degenerate single super-hop) — round-5 coarsening
    for hop in (1, 2, 4, 8):
        rplan = D.make_ring_plan(a, a, 8, bounds=bounds, hop=hop)
        c = unshard(D.dist_spgemm_ring(
            a_sh, b_sh, a.rowptr, mesh, axis="rows", ring_plan=rplan
        ))
        assert_csr_equal(c, want, rtol=1e-4, atol=1e-5)

    hplan = build_halo_plan(a, a, 8, bounds=bounds)
    c = unshard(dist_spgemm_halo(hplan, b_sh, mesh))
    assert_csr_equal(c, want, rtol=1e-4, atol=1e-5)


def test_dist_two_devices(eight_devices):
    mesh = make_mesh(2)
    a = random_csr(64, 64, density=0.1, seed=7)
    c = dist_spgemm(a, a, mesh, schedule="ring")
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_dist_spadd(eight_devices):
    import scipy.sparse as sp

    from benchmark_spgemm_using_csr_tpu.parallel.dist import dist_spadd

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    sa = sp.random(300, 200, density=0.05, random_state=rng, format="csr",
                   dtype=np.float32)
    sb = sp.random(300, 200, density=0.05, random_state=rng, format="csr",
                   dtype=np.float32)
    c = dist_spadd(CSR.from_scipy(sa), CSR.from_scipy(sb), mesh,
                   alpha=2.0, beta=-1.0)
    assert_csr_equal(c, (2.0 * sa - sb).tocsr(), check_explicit_zeros=False)


def test_dist_spadd_matches_single_chip(eight_devices):
    from benchmark_spgemm_using_csr_tpu.ops.spadd import spadd
    from benchmark_spgemm_using_csr_tpu.parallel.dist import dist_spadd

    mesh = make_mesh(4)
    sa = generators.erdos_renyi(257, 257, 6.0, seed=1)  # non-divisible m
    sb = generators.erdos_renyi(257, 257, 6.0, seed=2)
    a, b = CSR.from_scipy(sa), CSR.from_scipy(sb)
    c_dist = dist_spadd(a, b, mesh)
    c_one = spadd(a, b)
    assert_csr_equal(c_dist, c_one.to_scipy())


def test_dist_grouped_local_kernel(eight_devices):
    """Replicated schedule with the grouped-ESC per-shard kernel (forced
    via make_dist_grouped_plan, independent of the cost-model pick)."""
    from benchmark_spgemm_using_csr_tpu.parallel.dist import (
        dist_spgemm_replicated,
        make_dist_grouped_plan,
    )

    mesh = make_mesh(8)
    a = CSR.from_scipy(
        generators.power_law(415, 415, alpha=1.8, max_deg=150, seed=9)
    )  # m not divisible by 8 -> padded rows exercise empty-row handling
    gp = make_dist_grouped_plan(a, a, 8)
    assert gp is not None
    a_sh = shard_rows(a, 8)
    c_sh = dist_spgemm_replicated(a_sh, a, mesh, grouped_plan=gp)
    c = unshard(c_sh)
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)


def test_dist_grouped_auto_pick(eight_devices):
    """dist_spgemm routes through the grouped local kernel when the
    dispatcher's cost model prefers it; result stays oracle-exact."""
    from benchmark_spgemm_using_csr_tpu.ops import dispatch as D
    from benchmark_spgemm_using_csr_tpu.parallel import dist as dmod

    mesh = make_mesh(4)
    a = CSR.from_scipy(
        generators.power_law(300, 300, alpha=1.8, max_deg=64, seed=11)
    )
    gp_wins = D.estimate_grouped_s(a) < D.estimate_chunked_s(a)
    c = dist_spgemm(a, a, mesh, schedule="replicated")
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
    # the plan cache must hold whichever plan type the model chose
    kinds = {type(v[0]).__name__ for v in dmod._PLAN_CACHE.values()}
    if gp_wins:
        assert "DistGroupedPlan" in kinds
