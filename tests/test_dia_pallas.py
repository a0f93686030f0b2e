"""Fused multi-plane DIA Pallas kernel vs the XLA gather form + scipy."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu.ops.dia import dia_spgemm
from benchmark_spgemm_using_csr_tpu.ops.dia_pallas import dia_spgemm_fused
from benchmark_spgemm_using_csr_tpu.sparse.dia import DIA
from benchmark_spgemm_using_csr_tpu.utils import generators


def _check(a_sp, b_sp, bj=512):
    a = DIA.from_scipy(a_sp.todia())
    b = DIA.from_scipy(b_sp.todia())
    got = dia_spgemm_fused(a, b, bj=bj, interpret=True)
    want = dia_spgemm(a, b, fused=False)
    assert got.offsets == want.offsets
    np.testing.assert_allclose(
        np.asarray(got.data), np.asarray(want.data), rtol=1e-5, atol=1e-6
    )
    wsp = (a_sp @ b_sp).tocsr()
    gsp = got.to_scipy().tocsr()
    np.testing.assert_allclose(
        gsp.toarray(), wsp.toarray(), rtol=1e-4, atol=1e-5
    )


def test_fused_poisson():
    a = generators.poisson2d(16)  # offsets +-16, n=256
    _check(a, a, bj=128)


def test_fused_banded_asymmetric():
    a = generators.banded(512, bandwidth=3, seed=1)
    b = generators.banded(512, bandwidth=5, seed=2)
    _check(a, b, bj=256)


def test_fused_ragged_last_block():
    # n not a multiple of bj exercises the padded tail block
    a = generators.banded(300, bandwidth=2, seed=3)
    _check(a, a, bj=128)


def test_fused_span_guard():
    a = DIA.from_scipy(generators.banded(256, bandwidth=4).todia())
    with pytest.raises(ValueError):
        dia_spgemm_fused(a, a, bj=2, interpret=True)


def test_auto_route_stays_on_xla_off_tpu():
    # CPU backend: dia_spgemm must keep the XLA form (fused=None auto)
    a = DIA.from_scipy(generators.poisson2d(8).todia())
    c = dia_spgemm(a, a)
    want = dia_spgemm(a, a, fused=False)
    np.testing.assert_allclose(np.asarray(c.data), np.asarray(want.data))
