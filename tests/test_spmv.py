import jax.numpy as jnp
import numpy as np

from benchmark_spgemm_using_csr_tpu import BSR, CSR
from benchmark_spgemm_using_csr_tpu.ops.spmv import bsr_spmm, spmm, spmv, spmv_t
from benchmark_spgemm_using_csr_tpu.utils import generators
from benchmark_spgemm_using_csr_tpu.utils.oracle import random_csr


def test_spmv():
    a = random_csr(64, 48, density=0.1, seed=0)
    x = np.random.default_rng(1).standard_normal(48).astype(np.float32)
    got = np.asarray(spmv(a, jnp.asarray(x)))
    want = a.to_scipy() @ x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spmm():
    a = random_csr(64, 48, density=0.1, seed=2)
    x = np.random.default_rng(3).standard_normal((48, 16)).astype(np.float32)
    got = np.asarray(spmm(a, jnp.asarray(x)))
    want = a.to_scipy() @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bsr_spmm():
    mat = generators.poisson2d(16)  # 256x256
    b = BSR.from_scipy(mat, block_shape=(8, 8))
    x = np.random.default_rng(4).standard_normal((256, 8)).astype(np.float32)
    got = np.asarray(bsr_spmm(b, jnp.asarray(x)))
    want = mat @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spmv_transpose():
    a = random_csr(40, 60, density=0.1, seed=5)
    y = np.random.default_rng(6).standard_normal(40).astype(np.float32)
    got = np.asarray(spmv_t(a, jnp.asarray(y), 60))
    want = a.to_scipy().T @ y
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
