"""Synthetic sparse-matrix generators covering the reference suite's regimes.

The reference benchmarks on SuiteSparse matrices (cant, webbase-1M,
mac_econ_fwd500, mouse_gene, ... — SURVEY.md §8). No network access exists
here, so we generate matrices that reproduce each regime's *row-size
distribution*, which is what drives the bin dispatcher and kernel choice
(SURVEY.md §4 stage 2):

- ``poisson2d``   : 5-point stencil, uniform short rows (FEM-like: cant/consph)
- ``banded``      : diagonal band, uniform rows
- ``erdos_renyi`` : iid random, Poisson row lengths (economics-like)
- ``power_law``   : scale-free row lengths (webbase-1M / mouse_gene-like;
                    stresses the long-row / hash path)

All return scipy.sparse CSR (host side); wrap with ``CSR.from_scipy``.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def poisson2d(k: int, dtype=np.float32) -> sp.csr_matrix:
    """(k*k, k*k) 5-point Laplacian on a k x k grid."""
    n = k * k
    main = np.full(n, 4.0, dtype)
    offs = np.full(n - 1, -1.0, dtype)
    # cut the east/west links across grid-row boundaries
    offs[np.arange(1, k) * k - 1] = 0.0
    ns = np.full(n - k, -1.0, dtype)
    mat = sp.diags(
        [main, offs, offs, ns, ns], [0, 1, -1, k, -k], shape=(n, n), format="csr"
    )
    return mat.astype(dtype)


def banded(n: int, bandwidth: int = 8, dtype=np.float32, seed: int = 0) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    diags = []
    offsets = []
    for off in range(-bandwidth, bandwidth + 1):
        diags.append(rng.standard_normal(n - abs(off)).astype(dtype))
        offsets.append(off)
    return sp.diags(diags, offsets, shape=(n, n), format="csr").astype(dtype)


def erdos_renyi(
    m: int, n: int, nnz_per_row: float = 8.0, dtype=np.float32, seed: int = 0
) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    lens = rng.poisson(nnz_per_row, size=m)
    lens = np.clip(lens, 0, n)
    total = int(lens.sum())
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    cols = rng.integers(0, n, size=total, dtype=np.int64)
    vals = rng.standard_normal(total).astype(dtype)
    mat = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def power_law(
    m: int,
    n: int,
    alpha: float = 2.1,
    min_deg: int = 1,
    max_deg: int | None = None,
    dtype=np.float32,
    seed: int = 0,
) -> sp.csr_matrix:
    """Scale-free row-length distribution (P(len=d) ~ d^-alpha) with column
    choices also power-law biased — mimics webbase/mouse_gene style skew that
    stresses the long-row numeric path (BASELINE.json:10)."""
    rng = np.random.default_rng(seed)
    max_deg = max_deg or max(n // 2, min_deg + 1)
    # inverse-CDF sample of a discrete power law on [min_deg, max_deg]
    u = rng.random(m)
    a1 = 1.0 - alpha
    lo, hi = float(min_deg) ** a1, float(max_deg) ** a1
    lens = np.floor((lo + u * (hi - lo)) ** (1.0 / a1)).astype(np.int64)
    lens = np.clip(lens, min_deg, min(max_deg, n))
    total = int(lens.sum())
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    # bias columns toward low indices (hub columns), zipf-ish
    cols = (n * rng.random(total) ** 2.5).astype(np.int64)
    cols = np.clip(cols, 0, n - 1)
    vals = rng.standard_normal(total).astype(dtype)
    mat = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


SUITE = {
    # name -> factory; stands in for the reference's SuiteSparse suite
    "poisson2d_64": lambda: poisson2d(64),
    "poisson2d_256": lambda: poisson2d(256),
    "banded_16k": lambda: banded(16384, bandwidth=12),
    "er_small": lambda: erdos_renyi(4096, 4096, 8.0),
    "er_medium": lambda: erdos_renyi(65536, 65536, 12.0),
    "powerlaw_small": lambda: power_law(4096, 4096, alpha=2.0, max_deg=512),
    "powerlaw_medium": lambda: power_law(65536, 65536, alpha=2.0, max_deg=4096),
}
