"""CSR.validate structural checks."""
import jax.numpy as jnp
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.utils import generators


def test_validate_ok():
    a = CSR.from_scipy(generators.poisson2d(8))
    assert a.validate() is a


def _base():
    return CSR.from_scipy(generators.poisson2d(8))


def test_validate_bad_rowptr_shape():
    a = _base()
    bad = CSR(a.rowptr[:-1], a.colidx, a.vals, a.shape)
    with pytest.raises(ValueError, match="rowptr shape"):
        bad.validate()


def test_validate_decreasing_rowptr():
    a = _base()
    rp = np.asarray(a.rowptr).copy()
    rp[3] = rp[4] + 5
    bad = CSR(jnp.asarray(rp), a.colidx, a.vals, a.shape)
    with pytest.raises(ValueError, match="non-decreasing"):
        bad.validate()


def test_validate_colidx_out_of_range():
    a = _base()
    ci = np.asarray(a.colidx).copy()
    ci[0] = a.n + 7
    bad = CSR(a.rowptr, jnp.asarray(ci), a.vals, a.shape)
    with pytest.raises(ValueError, match="out of range"):
        bad.validate()


def test_validate_nnz_exceeds_capacity():
    a = _base()
    rp = np.asarray(a.rowptr).copy()
    rp[-1] = a.capacity + 1
    bad = CSR(jnp.asarray(rp), a.colidx, a.vals, a.shape)
    with pytest.raises(ValueError, match="exceeds capacity"):
        bad.validate()
