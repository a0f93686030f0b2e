import numpy as np

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.roofline import (
    TPU_V5E,
    chunked_stage_models,
    roofline_report,
    spgemm_stage_models,
    tilepack_stage_models,
)


def test_stage_models_positive():
    sm = spgemm_stage_models(nnz_a=1000, nnz_b=1000, m=100, total_products=5000, nnz_c=3000)
    assert set(sm) == {"symbolic", "expand", "sort", "compress"}
    for v in sm.values():
        assert v.bytes_moved > 0
        assert v.sol_time_s(TPU_V5E) > 0


def _stats(a):
    rowptr = np.asarray(a.rowptr)
    nnz_a = int(rowptr[-1])
    cols = np.asarray(a.colidx)[:nnz_a]
    f = int(np.diff(rowptr)[cols].sum())
    pat = a.to_scipy().astype(bool)
    nnz_c = int((pat @ pat).nnz)
    return nnz_a, f, nnz_c


def test_chunked_plan_aware_bound_positive_and_descriptor_scaled():
    """The plan-aware chunked bound must (a) be positive, (b) charge FEWER
    expansion descriptors for an al-aligned plan than for the narrow k=1
    plan of the same matrix — the round-1 defect was charging 1 descriptor
    per product regardless of plan (sol_fraction > 1 on aligned paths)."""
    from benchmark_spgemm_using_csr_tpu.ops.chunked import make_chunked_plan

    a = CSR.from_scipy(generators.erdos_renyi(512, 512, 8.0, seed=3))
    nnz_a, f, nnz_c = _stats(a)

    plan_n = make_chunked_plan(a, a, k=1)
    plan_a = make_chunked_plan(a, a, al=8)
    sm_n = chunked_stage_models(plan_n, nnz_a, nnz_a, a.m, nnz_c)
    sm_a = chunked_stage_models(plan_a, nnz_a, nnz_a, a.m, nnz_c)
    for sm in (sm_n, sm_a):
        assert set(sm) == {"metadata", "expand", "sort", "runsum", "compact"}
        for v in sm.values():
            assert v.sol_time_s(TPU_V5E) > 0
    # narrow: one descriptor per padded product; aligned: one per al-chunk
    # (plus the table build) — structurally fewer on a mean-8-row matrix
    assert sm_a["expand"].descriptors < sm_n["expand"].descriptors


def test_tilepack_plan_aware_bound():
    from benchmark_spgemm_using_csr_tpu.ops.tilepack import make_tilepack_plan

    a = CSR.from_scipy(generators.erdos_renyi(512, 512, 8.0, seed=3))
    nnz_a, f, nnz_c = _stats(a)
    sched = make_tilepack_plan(a, a)
    assert sched is not None
    sm = tilepack_stage_models(sched.plan, nnz_a, nnz_a, a.m, nnz_c)
    assert set(sm) == {"metadata", "expand", "tile_sort_merge", "compact"}
    total = sum(v.sol_time_s(TPU_V5E) for v in sm.values())
    assert total > 0
    # the kernel stage is tile-lane-rate bound, not descriptor bound
    assert sm["tile_sort_merge"].tile_lanes == sched.plan.t_cap * sched.plan.w
    # tilepack was chosen over narrow chunked BECAUSE it does fewer
    # descriptors: its expand bound must not exceed the generic
    # one-descriptor-per-product charge that produced sol_fraction > 1
    generic = spgemm_stage_models(nnz_a, nnz_a, a.m, f, nnz_c)
    assert (
        sm["expand"].sol_time_s(TPU_V5E)
        <= max(generic["expand"].descriptors / TPU_V5E.gather_desc_per_s,
               generic["expand"].sol_time_s(TPU_V5E))
    )


def test_report_fractions():
    sm = spgemm_stage_models(1000, 1000, 100, 5000, 3000)
    times = {k: v.sol_time_s(TPU_V5E) * 2 for k, v in sm.items()}  # 50% of SoL
    rep = roofline_report(sm, times, total_time_s=sum(times.values()))
    for k in sm:
        assert abs(rep[k]["sol_fraction"] - 0.5) < 1e-9
    assert abs(rep["_total"]["sol_fraction"] - 0.5) < 1e-9
