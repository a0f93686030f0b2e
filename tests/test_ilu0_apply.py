"""ILU0 preconditioner application (Jacobi triangular solves) + PCG demo."""
import numpy as np
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu import CSR
from benchmark_spgemm_using_csr_tpu.models.ilu0 import (
    ilu0,
    ilu0_apply,
    pcg,
    split_lu,
)
from benchmark_spgemm_using_csr_tpu.utils import generators


def _spd_poisson(k):
    return generators.poisson2d(k)


def test_ilu0_apply_matches_exact_trisolve():
    import jax.numpy as jnp

    a_sp = _spd_poisson(8)
    a = CSR.from_scipy(a_sp)
    f = ilu0(a, sweeps=20)
    l, u = split_lu(f)
    rng = np.random.default_rng(0)
    r = rng.standard_normal(a.m).astype(np.float32)
    want = sp.linalg.spsolve_triangular(
        u.tocsr(), sp.linalg.spsolve_triangular(l.tocsr(), r, lower=True),
        lower=False,
    )
    got = np.asarray(ilu0_apply(f, jnp.asarray(r), iters=60))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pcg_converges_faster_with_ilu0():
    import jax.numpy as jnp

    a_sp = _spd_poisson(16)
    a = CSR.from_scipy(a_sp)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(a.m).astype(np.float32))

    f = ilu0(a, sweeps=20)
    x_pc, hist_pc = pcg(a, b, f, tol=1e-5, max_iters=150, solve_iters=30)
    x_cg, hist_cg = pcg(a, b, None, tol=1e-5, max_iters=150)

    # both converge; preconditioned takes fewer iterations
    assert hist_pc[-1] < 1e-4 and hist_cg[-1] < 1e-4
    assert len(hist_pc) < len(hist_cg)
    # and solves the system
    res = np.linalg.norm(a_sp @ x_pc - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-3


def test_pcg_exact_precond_beats_jacobi_iters():
    import jax.numpy as jnp

    a_sp = _spd_poisson(16)
    a = CSR.from_scipy(a_sp)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(a.m).astype(np.float32))

    f = ilu0(a, sweeps=20)
    x_ex, hist_ex = pcg(a, b, f, tol=1e-5, max_iters=150, precond="exact")
    _, hist_cg = pcg(a, b, None, tol=1e-5, max_iters=150)

    assert hist_ex[-1] < 1e-4
    assert len(hist_ex) < len(hist_cg)
    res = np.linalg.norm(a_sp @ x_ex - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-3
