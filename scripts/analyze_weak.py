"""Host-side analysis of the round-3 weak band (VERDICT r3 weak #1-#3):
per-row product distributions + cost-model estimates per backend, to size
the hybrid split-row routing design and the dense-extraction rework.

CPU-only (forces JAX_PLATFORMS=cpu): pure numpy/scipy + plan-time cost
models — no device work.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import scipy.sparse as sp

import sys
sys.path.insert(0, "/root/repo")

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops import dispatch as D
from benchmark_spgemm_using_csr_tpu.utils import generators

NAMES = [
    "fem_17k", "fem_32k", "pdb_8k", "scircuit_256k", "circuit_64k",
    "webbase_1m", "dense_rows_2k", "econ_206k",
]

for name in NAMES:
    a_sp = generators.SUITE[name]().tocsr()
    m, n = a_sp.shape
    row_lens = np.diff(a_sp.indptr)
    b_lens = row_lens  # A@A
    prod_per_row = np.add.reduceat(
        np.concatenate([b_lens[a_sp.indices], [0]]),
        np.minimum(a_sp.indptr[:-1], a_sp.nnz - 1),
    ) * (row_lens > 0)
    products = int(prod_per_row.sum())
    pat = sp.csr_matrix(
        (np.ones(a_sp.nnz, np.float64), a_sp.indices, a_sp.indptr), shape=a_sp.shape
    )
    pc = pat @ pat
    nnz_c = int(pc.nnz)
    q = np.quantile(prod_per_row, [0.5, 0.9, 0.99, 0.999, 1.0])
    # top-row concentration: what fraction of products live in the top
    # 1% / 0.1% of rows by product count
    srt = np.sort(prod_per_row)[::-1]
    cum = np.cumsum(srt)
    top1 = cum[max(m // 100, 1) - 1] / max(products, 1)
    top01 = cum[max(m // 1000, 1) - 1] / max(products, 1)
    a = CSR.from_scipy(a_sp)
    est = {
        "chunked": D.estimate_chunked_s(a, a),
        "bsr": D.estimate_bsr_s(a, a),
        "dia": D.estimate_dia_s(a, a),
        "dense": D.estimate_dense_s(a, a),
        "tilepack": D.estimate_tilepack_s(a, a),
        "grouped": D.estimate_grouped_s(a, a),
        "hash": D.estimate_hash_s(a, a),
    }
    est_s = {k: (f"{v*1e3:.1f}ms" if np.isfinite(v) else "inf")
             for k, v in est.items()}
    print(f"== {name}: m={m} nnz={a_sp.nnz} products={products/1e6:.1f}M "
          f"nnz_c={nnz_c/1e6:.2f}M fill_c={nnz_c/(m*n):.3f}")
    print(f"   prod/row q50={q[0]:.0f} q90={q[1]:.0f} q99={q[2]:.0f} "
          f"q99.9={q[3]:.0f} max={q[4]:.0f}  top1%rows={top1:.1%} "
          f"top0.1%rows={top01:.1%}")
    print(f"   est: {est_s}")
