"""Retry / phase-checkpoint driver tests (SURVEY.md §7.3/§7.4)."""
import numpy as np
import pytest

from benchmark_spgemm_using_csr_tpu import CSR, spgemm
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import (
    assert_csr_equal,
    spgemm_reference,
)
from benchmark_spgemm_using_csr_tpu.utils.retry import Checkpointer, retry


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return 42

    assert retry(flaky, attempts=3, backoff_s=0.01) == 42
    assert calls["n"] == 3


def test_retry_exhausts():
    def always():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError):
        retry(always, attempts=2, backoff_s=0.01)


def test_checkpointer_phase_resume(tmp_path):
    a = CSR.from_scipy(generators.poisson2d(12))
    ck = Checkpointer(str(tmp_path))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spgemm(a, a)

    c1 = ck.phase("galerkin0", compute)
    assert calls["n"] == 1 and ck.done("galerkin0")
    c2 = ck.phase("galerkin0", compute)  # resumes from disk
    assert calls["n"] == 1
    want = spgemm_reference(a, a)
    assert_csr_equal(c1, want, rtol=1e-4, atol=1e-5)
    assert_csr_equal(c2, want, rtol=1e-4, atol=1e-5)


def test_checkpointer_retries_flaky_phase(tmp_path):
    a = CSR.from_scipy(generators.poisson2d(8))
    ck = Checkpointer(str(tmp_path))
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("preempted")
        return spgemm(a, a)

    c = ck.phase("lvl", flaky)
    assert calls["n"] == 2
    assert_csr_equal(c, spgemm_reference(a, a), rtol=1e-4, atol=1e-5)
