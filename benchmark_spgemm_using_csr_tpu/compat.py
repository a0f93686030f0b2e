"""bhsparse-compatible object facade.

The reference exposes one class (``bhsparse`` in bhsparse.h [R], SURVEY.md
§2/§3 component 3): ``initPlatform / initData / spgemm / get_nnzC / get_C /
free_mem``, so the CUDA and OpenCL backends are interchangeable behind it.
This module reproduces that interface verbatim (snake_case) for users
porting reference driver code; internally everything routes through the
functional facade (api.spgemm) — the "backend" is the method dispatch
(chunked / bsr / hash / ...).

>>> h = BhSparse()
>>> h.init_platform()
>>> h.init_data(m, k, n, rowptr_a, colidx_a, vals_a, rowptr_b, colidx_b, vals_b)
>>> h.spgemm()
>>> nnz_c = h.get_nnz_c()
>>> rowptr_c, colidx_c, vals_c = h.get_c()
>>> h.free_mem()
"""
from __future__ import annotations

import numpy as np

from .sparse.csr import CSR


class BhSparse:
    """Stateful wrapper mirroring the reference's facade lifecycle."""

    def __init__(self, method: str = "auto"):
        self.method = method
        self._a = None
        self._b = None
        self._c = None
        self._device = None

    def init_platform(self) -> str:
        """Device discovery — the cudaSetDevice / OpenCL-context analogue."""
        import jax

        self._device = jax.devices()[0]
        return str(self._device)

    def init_data(
        self, m, k, n,
        rowptr_a, colidx_a, vals_a,
        rowptr_b, colidx_b, vals_b,
    ) -> None:
        """Host CSR arrays -> device containers (H2D of initData)."""
        import scipy.sparse as sp

        a = sp.csr_matrix(
            (np.asarray(vals_a), np.asarray(colidx_a), np.asarray(rowptr_a)),
            shape=(m, k),
        )
        b = sp.csr_matrix(
            (np.asarray(vals_b), np.asarray(colidx_b), np.asarray(rowptr_b)),
            shape=(k, n),
        )
        self._a = CSR.from_scipy(a)
        self._b = CSR.from_scipy(b)
        self._c = None

    def spgemm(self) -> None:
        from .api import spgemm

        if self._a is None or self._b is None:
            raise RuntimeError("init_data() not called")
        self._c = spgemm(self._a, self._b, method=self.method)

    def get_nnz_c(self) -> int:
        if self._c is None:
            raise RuntimeError("spgemm() not called")
        return int(np.asarray(self._c.rowptr)[-1])

    def get_c(self):
        """Returns (rowptr, colidx, vals) host arrays, exact-size (D2H)."""
        if self._c is None:
            raise RuntimeError("spgemm() not called")
        nnz = self.get_nnz_c()
        return (
            np.asarray(self._c.rowptr),
            np.asarray(self._c.colidx)[:nnz],
            np.asarray(self._c.vals)[:nnz],
        )

    def free_mem(self) -> None:
        self._a = self._b = self._c = None
