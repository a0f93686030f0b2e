"""Model-based sweep: would per-row-regime SPLITTING (VERDICT r3 next #1)
beat the single grouped dispatch on the heavy-tail matrices?

For each candidate threshold T on per-row product count, price:
  est_body  = estimate_grouped_s(A[body rows])   (short-row partition)
  est_heavy = estimate_grouped_s(A[heavy rows])  (hub partition)
  est_scatter_heavy = heavy products via scatter-add dense-accumulator
                      (the reference's hash-method analogue, restricted
                       to the rows where it could plausibly win)
  assembly  = one blockwise merge pass over nnz_c (scan-rate ~2 ns/elem)
              + nnz_c/8 aligned-copy descriptors
and compare the best combination against the unsplit estimate.

CPU-only host analysis; run alone (single core).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

from benchmark_spgemm_using_csr_tpu.sparse.csr import CSR
from benchmark_spgemm_using_csr_tpu.ops import dispatch as D
from benchmark_spgemm_using_csr_tpu.utils import generators

SCAN_NS_PER_ELEM = 2.0  # measured stream-pass cost (scancompact era)
ALIGNED_DESC_PER_S = 2.28e8


def split_cost(a_sp, prod_per_row, T):
    heavy = prod_per_row > T
    if not heavy.any() or heavy.all():
        return None
    rows = np.arange(a_sp.shape[0])
    a_body = a_sp[rows[~heavy]]
    a_heavy = a_sp[rows[heavy]]
    # B stays the FULL matrix in both sub-products
    b = CSR.from_scipy(a_sp)
    cb = CSR.from_scipy(a_body.tocsr())
    ch = CSR.from_scipy(a_heavy.tocsr())
    est_body = min(
        D.estimate_grouped_s(cb, b), D.estimate_chunked_s(cb, b),
        D.estimate_tilepack_s(cb, b),
    )
    est_heavy = min(
        D.estimate_grouped_s(ch, b), D.estimate_chunked_s(ch, b),
    )
    # scatter-add dense accumulator for the heavy partition: products
    # descriptors + (H, n) sweep + compaction scatters
    ph = int(prod_per_row[heavy].sum())
    H = int(heavy.sum())
    n = a_sp.shape[1]
    est_scat = (
        ph / 1.30e8 + ph / 1.94e8 + ph / 2.28e8
        + H * n * 0.8e-9 + 2 * H * n / 1.4e8
    )
    pat = sp.csr_matrix(
        (np.ones(a_sp.nnz), a_sp.indices, a_sp.indptr), shape=a_sp.shape
    )
    nnz_c = int((pat @ pat).nnz)
    assembly = nnz_c * SCAN_NS_PER_ELEM * 1e-9 + nnz_c / 8 / ALIGNED_DESC_PER_S
    return {
        "T": T, "H": H, "ph_frac": ph / max(prod_per_row.sum(), 1),
        "body_ms": est_body * 1e3, "heavy_ms": est_heavy * 1e3,
        "heavy_scat_ms": est_scat * 1e3, "assembly_ms": assembly * 1e3,
        "total_ms": (est_body + min(est_heavy, est_scat) + assembly) * 1e3,
    }


for name in ("scircuit_256k", "circuit_64k", "webbase_1m", "econ_206k"):
    a_sp = generators.SUITE[name]().tocsr()
    row_lens = np.diff(a_sp.indptr)
    prod_per_row = np.zeros(a_sp.shape[0], np.int64)
    np.add.at(prod_per_row,
              np.repeat(np.arange(a_sp.shape[0]), row_lens),
              row_lens[a_sp.indices])
    a = CSR.from_scipy(a_sp)
    unsplit = min(D.estimate_grouped_s(a, a), D.estimate_chunked_s(a, a),
                  D.estimate_tilepack_s(a, a))
    print(f"== {name}: unsplit best est {unsplit*1e3:.1f} ms")
    for T in (64, 256, 1024, 4096):
        r = split_cost(a_sp, prod_per_row, T)
        if r is None:
            continue
        verdict = "WINS" if r["total_ms"] < unsplit * 1e3 else "loses"
        print(f"   T={T:5d} H={r['H']:6d} heavyprod={r['ph_frac']:.0%} "
              f"body={r['body_ms']:.0f} heavy={r['heavy_ms']:.0f} "
              f"scat={r['heavy_scat_ms']:.0f} asm={r['assembly_ms']:.0f} "
              f"-> total {r['total_ms']:.0f} ms ({verdict})")
