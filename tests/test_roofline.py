from benchmark_spgemm_using_csr_tpu.utils.roofline import (
    TPU_V5E,
    roofline_report,
    spgemm_stage_models,
)


def test_stage_models_positive():
    sm = spgemm_stage_models(nnz_a=1000, nnz_b=1000, m=100, total_products=5000, nnz_c=3000)
    assert set(sm) == {"symbolic", "expand", "sort", "compress"}
    for v in sm.values():
        assert v.bytes_moved > 0
        assert v.sol_time_s(TPU_V5E) > 0


def test_report_fractions():
    sm = spgemm_stage_models(1000, 1000, 100, 5000, 3000)
    times = {k: v.sol_time_s(TPU_V5E) * 2 for k, v in sm.items()}  # 50% of SoL
    rep = roofline_report(sm, times, total_time_s=sum(times.values()))
    for k in sm:
        assert abs(rep[k]["sol_fraction"] - 0.5) < 1e-9
    assert abs(rep["_total"]["sol_fraction"] - 0.5) < 1e-9
