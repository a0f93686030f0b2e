"""Synthetic sparse-matrix generators covering the reference suite's regimes.

The reference benchmarks on SuiteSparse matrices (cant, webbase-1M,
mac_econ_fwd500, mouse_gene, ... — SURVEY.md §8). No network access exists
here, so we generate matrices that reproduce each regime's *row-size
distribution*, which is what drives the bin dispatcher and kernel choice
(SURVEY.md §4 stage 2):

- ``poisson2d``   : 5-point stencil, uniform short rows (mc2depi-like)
- ``stencil27``   : 27-point 3D stencil, uniform mid rows (cant/consph/
                    pdb1HYS-like FEM regime, ~27-81 nnz/row)
- ``banded``      : diagonal band, uniform rows
- ``erdos_renyi`` : iid random, Poisson row lengths (mac_econ-like)
- ``power_law``   : scale-free row lengths (webbase-1M-like; stresses the
                    long-row / hash path)
- ``circuit``     : mostly 2-5 nnz rows plus a few dense hub rows/cols
                    (scircuit-like; stresses the 0/1-product and long-row
                    bins simultaneously)
- ``dense_rows``  : every row ~uniformly long (mouse_gene-like, mean
                    hundreds of nnz/row; stresses the merge/hash path)

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


def stencil27(k: int, dtype=np.float32) -> sp.csr_matrix:
    """(k^3, k^3) 27-point stencil on a k x k x k grid — the FEM regime
    (cant / consph / pdb1HYS analogue: uniform rows of ~27 nnz)."""
    n = k * k * k
    idx = np.arange(n, dtype=np.int64)
    x, y, z = idx // (k * k), (idx // k) % k, idx % k
    rows, cols, vals = [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = x + dx, y + dy, z + dz
                ok = (
                    (nx >= 0) & (nx < k) & (ny >= 0) & (ny < k)
                    & (nz >= 0) & (nz < k)
                )
                rows.append(idx[ok])
                cols.append((nx * k * k + ny * k + nz)[ok])
                w = 26.0 if (dx, dy, dz) == (0, 0, 0) else -1.0
                vals.append(np.full(int(ok.sum()), w, dtype))
    mat = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()
    mat.sort_indices()
    return mat.astype(dtype)


def fem(
    k: int, dof: int = 3, fill: float = 0.7, dtype=np.float32, seed: int = 0
) -> sp.csr_matrix:
    """cant / consph / pdb1HYS analogue (SURVEY.md §8): a 3D k^3 mesh with
    ``dof`` unknowns per node and 27-point node connectivity, each
    (node, neighbor) dof x dof block kept with probability ``fill``.

    Row lengths land irregularly in the classic FEM band (~dof*27*fill,
    i.e. ~40-80 nnz at dof=3): binomial block pruning varies rows the way
    element meshes do, and the dof blocks spread the structure over
    ~27 * (2*dof - 1) distinct diagonals — banded-ish but NOT
    diagonal-regular, so the DIA path's term cap rejects it and the
    irregular mid-row (bitonic-ESC bin) kernels carry the matrix, exactly
    the regime the reference's cant/consph stress (VERDICT r2 missing #3)."""
    rng = np.random.default_rng(seed)
    nn = k * k * k
    idx = np.arange(nn, dtype=np.int64)
    x, y, z = idx // (k * k), (idx // k) % k, idx % k
    rows_l, cols_l = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = x + dx, y + dy, z + dz
                ok = (
                    (nx >= 0) & (nx < k) & (ny >= 0) & (ny < k)
                    & (nz >= 0) & (nz < k)
                )
                if (dx, dy, dz) != (0, 0, 0):  # keep diagonal blocks always
                    ok &= rng.random(nn) < fill
                rows_l.append(idx[ok])
                cols_l.append((nx * k * k + ny * k + nz)[ok])
    brow = np.concatenate(rows_l)
    bcol = np.concatenate(cols_l)
    # expand each kept node block to a dense dof x dof block
    di = np.arange(dof, dtype=np.int64)
    r = brow[:, None, None] * dof + di[None, :, None]  # (B, dof, 1)
    c = bcol[:, None, None] * dof + di[None, None, :]  # (B, 1, dof)
    r, c = np.broadcast_arrays(r, c)
    r, c = r.reshape(-1).copy(), c.reshape(-1).copy()
    v = rng.standard_normal(r.size).astype(dtype)
    n = nn * dof
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def fem_irregular(
    k: int, dof: int = 3, fill: float = 0.7, dtype=np.float32, seed: int = 0
) -> sp.csr_matrix:
    """FEM matrix from an IRREGULAR mesh ordering: ``fem`` with the node ids
    randomly permuted before dof expansion.

    Real cant/consph come from unstructured meshes whose orderings spread
    each row's ~60 nnz over an effectively arbitrary set of column offsets —
    thousands of distinct diagonals, so neither DIA (term blow-up) nor BSR
    (block occupancy collapses) can take them and the mid-row ESC kernels
    carry the product. The regular ``fem`` generator turned out to have only
    ~99 distinct scalar diagonals (27 stencil offsets x dof sub-diagonals),
    which the DIA gather form exploits for a ~100x win (round 4 A/B,
    scripts/ab_fem_dia.py) — a legitimate dispatch for THAT matrix, but it
    vacates the irregular-FEM test regime. This generator restores it: the
    permutation preserves the row-length distribution and product structure
    exactly (C_perm = P @ C @ P^T) while destroying diagonal locality."""
    base = fem(k, dof=1, fill=fill, dtype=dtype, seed=seed)
    rng = np.random.default_rng(seed + 0x5EED)
    nn = base.shape[0]
    perm = rng.permutation(nn)
    base = base[perm][:, perm].tocsr()
    if dof == 1:
        base.sort_indices()
        return base.astype(dtype)
    # dof-expand AFTER permuting node ids: dof x dof blocks stay dense
    # (consph-like) but block positions are irregular
    coo = base.tocoo()
    di = np.arange(dof, dtype=np.int64)
    r = coo.row.astype(np.int64)[:, None, None] * dof + di[None, :, None]
    c = coo.col.astype(np.int64)[:, None, None] * dof + di[None, None, :]
    r, c = np.broadcast_arrays(r, c)
    r, c = r.reshape(-1).copy(), c.reshape(-1).copy()
    v = rng.standard_normal(r.size).astype(dtype)
    n = nn * dof
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def circuit(
    n: int, nnz_per_row: float = 3.0, n_hubs: int | None = None,
    hub_deg: int | None = None, dtype=np.float32, seed: int = 0,
) -> sp.csr_matrix:
    """scircuit-like: overwhelmingly short rows (diagonal + a couple of
    couplings) plus a handful of dense rail rows AND rail columns."""
    rng = np.random.default_rng(seed)
    n_hubs = n_hubs if n_hubs is not None else max(2, n // 2048)
    hub_deg = hub_deg if hub_deg is not None else min(n, 2048)
    lens = rng.poisson(nnz_per_row, size=n).clip(1, n)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = rng.integers(0, n, size=int(lens.sum()), dtype=np.int64)
    hubs = rng.choice(n, size=n_hubs, replace=False)
    hub_rows = np.repeat(hubs, hub_deg)
    hub_cols = rng.integers(0, n, size=n_hubs * hub_deg, dtype=np.int64)
    # rail columns: a slice of the short rows also touch a hub column (each
    # such entry expands to a full hub row — the long-row stress), kept to
    # n/16 so C=A*A stays in single-dispatch range
    n_rail = n // 16
    rail_rows = rng.integers(0, n, size=n_rail, dtype=np.int64)
    rail_cols = rng.choice(hubs, size=n_rail)
    diag = np.arange(n, dtype=np.int64)
    r = np.concatenate([rows, hub_rows, rail_rows, diag])
    c = np.concatenate([cols, hub_cols, rail_cols, diag])
    v = rng.standard_normal(r.size).astype(dtype)
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def dense_rows(
    m: int, n: int, nnz_per_row: int = 384, jitter: float = 0.25,
    dtype=np.float32, seed: int = 0,
) -> sp.csr_matrix:
    """mouse_gene-like: every row long (hundreds of nnz) — the merge/hash
    long-row regime at high intermediate-product density."""
    rng = np.random.default_rng(seed)
    lo = max(1, int(nnz_per_row * (1 - jitter)))
    hi = min(n, int(nnz_per_row * (1 + jitter)))
    lens = rng.integers(lo, hi + 1, size=m)
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    cols = rng.integers(0, n, size=int(lens.sum()), dtype=np.int64)
    vals = rng.standard_normal(rows.size).astype(dtype)
    mat = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def hub_rows(
    m: int, n: int, alpha: float = 1.9, max_deg: int = 8192,
    n_hubs: int = 24, dtype=np.float32, seed: int = 0,
) -> sp.csr_matrix:
    """mouse_gene-like: power-law row lengths PLUS a band of explicit
    ~max_deg-nnz hub rows (mouse_gene: 45k rows, mean ~640 nnz, heaviest
    rows ~10k). Distinct from ``dense_rows`` (uniform) and ``power_law``
    (smooth tail): the hub band concentrates a large product share in a
    handful of rows — the reference's merge/progressive-allocation stress
    (SURVEY.md §8, BASELINE.json config #4)."""
    rng = np.random.default_rng(seed)
    base = power_law(m, n, alpha=alpha, min_deg=2, max_deg=max_deg // 8,
                     dtype=dtype, seed=seed)
    hubs = rng.choice(m, size=n_hubs, replace=False)
    hr = np.repeat(hubs, max_deg)
    hc = rng.integers(0, n, size=n_hubs * max_deg, dtype=np.int64)
    hv = rng.standard_normal(hr.size).astype(dtype)
    mat = (base + sp.coo_matrix((hv, (hr, hc)), shape=(m, n))).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def road_net(
    k: int, drop: float = 0.3, shortcut: float = 0.01,
    dtype=np.float32, seed: int = 0,
) -> sp.csr_matrix:
    """roadNet-CA-like (SURVEY.md §8 suite family): a near-planar network
    with VERY short rows (~3-4 nnz: degree-2/3/4 junctions), symmetric,
    huge diameter, no hubs. Built as a k x k grid graph with ``drop`` of
    the edges removed, ~``shortcut``*n random long links (highways), node
    ids PERMUTED (road matrices are not band-ordered), plus the diagonal.
    The ultra-short-row regime stresses per-row metadata cost — the
    opposite end of the bin spectrum from mouse_gene (VERDICT r4 missing
    #2)."""
    rng = np.random.default_rng(seed)
    n = k * k
    idx = np.arange(n, dtype=np.int64)
    x, y = idx // k, idx % k
    e1r = idx[y < k - 1]  # east
    e2r = idx[x < k - 1]  # south
    er = np.concatenate([e1r, e2r])
    ec = np.concatenate([e1r + 1, e2r + k])
    keep = rng.random(er.size) >= drop
    er, ec = er[keep], ec[keep]
    ns = int(n * shortcut)
    sr = rng.integers(0, n, size=ns, dtype=np.int64)
    sc = rng.integers(0, n, size=ns, dtype=np.int64)
    r = np.concatenate([er, sr])
    c = np.concatenate([ec, sc])
    perm = rng.permutation(n)
    r, c = perm[r], perm[c]
    rows = np.concatenate([r, c, idx])
    cols = np.concatenate([c, r, idx])
    vals = rng.standard_normal(rows.size).astype(dtype)
    mat = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def small_world(
    n: int, k: int = 4, rewire: float = 0.1,
    dtype=np.float32, seed: int = 0,
) -> sp.csr_matrix:
    """amazon0312-like small-world graph (~2k+1 nnz/row): ring lattice
    with k neighbors per side, ``rewire`` of the edge endpoints replaced
    by uniform random targets (Watts-Strogatz), symmetrized + diagonal.
    The intact lattice part is LOCAL (few offsets) but the rewired links
    scatter over ~n distinct offsets, so the DIA term cap rejects it and
    the short-row sort path carries it — the co-purchase-network regime
    of the published suite (VERDICT r4 missing #2)."""
    rng = np.random.default_rng(seed)
    idx = np.arange(n, dtype=np.int64)
    rows_l, cols_l = [], []
    for off in range(1, k + 1):
        tgt = (idx + off) % n
        rew = rng.random(n) < rewire
        tgt = np.where(rew, rng.integers(0, n, size=n, dtype=np.int64), tgt)
        rows_l.append(idx)
        cols_l.append(tgt)
    r = np.concatenate(rows_l)
    c = np.concatenate(cols_l)
    rows = np.concatenate([r, c, idx])
    cols = np.concatenate([c, r, idx])
    vals = rng.standard_normal(rows.size).astype(dtype)
    mat = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    return mat


def rect_pair(
    m: int, k: int, n: int, nnz_per_row_a: float = 10.0,
    nnz_per_row_b: float = 12.0, dtype=np.float32, seed: int = 0,
) -> tuple[sp.csr_matrix, sp.csr_matrix]:
    """A (m x k) @ B (k x n) with three DISTINCT dims — the plain
    rectangular SpGEMM suite point (VERDICT r3 next #6; the reference's
    initData takes (m, k, n) even though its benchmark squares A)."""
    a = erdos_renyi(m, k, nnz_per_row_a, dtype=dtype, seed=seed)
    b = erdos_renyi(k, n, nnz_per_row_b, dtype=dtype, seed=seed + 1)
    return a, b


def write_pattern_mtx(path: str, m: int = 65536, seed: int = 9) -> None:
    """Emit a Matrix Market PATTERN file (no values stored) with a
    circuit-like structure — the suite's pattern-matrix point reads it
    back through utils/mtx (values synthesized to 1.0), exercising the
    reference's pattern-mtx driver contract end-to-end (SURVEY.md §4:
    'values taken from file or synthesized for pattern matrices')."""
    mat = circuit(m, seed=seed)
    coo = mat.tocoo()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{coo.shape[0]} {coo.shape[1]} {coo.nnz}\n")
        np.savetxt(f, np.stack([coo.row + 1, coo.col + 1], 1), fmt="%d")


def pattern_mtx_roundtrip(m: int = 65536, seed: int = 9) -> sp.csr_matrix:
    """Write + read the pattern .mtx (cached per process) and return the
    value-synthesized CSR."""
    import os
    import tempfile

    from . import mtx

    path = os.path.join(
        tempfile.gettempdir(), f"pattern_circuit_{m}_{seed}.mtx"
    )
    if not os.path.exists(path):
        write_pattern_mtx(path, m=m, seed=seed)
    return mtx.read_mtx(path).tocsr()


SUITE = {
    # name -> factory; stands in for the reference's SuiteSparse suite
    "poisson2d_64": lambda: poisson2d(64),
    "poisson2d_256": lambda: poisson2d(256),
    "banded_16k": lambda: banded(16384, bandwidth=12),
    "er_small": lambda: erdos_renyi(4096, 4096, 8.0),
    "er_medium": lambda: erdos_renyi(65536, 65536, 12.0),
    "powerlaw_small": lambda: power_law(4096, 4096, alpha=2.0, max_deg=512),
    "powerlaw_medium": lambda: power_law(65536, 65536, alpha=2.0, max_deg=4096),
    # reference-suite regime analogues (SURVEY.md §8 matrix list)
    "stencil27_32": lambda: stencil27(32),          # cant/consph FEM regime
    "circuit_64k": lambda: circuit(65536),          # scircuit regime
    "dense_rows_2k": lambda: dense_rows(2048, 2048, nnz_per_row=96),
    #                                               ^ mouse_gene regime
    "dense_rows_8k": lambda: dense_rows(8192, 8192, nnz_per_row=384),
    #                        ^ mouse_gene at scale (~1.2e9 products;
    #                          out-of-core / batched path only)
    # reference-SCALE points (VERDICT r1 missing #2/#3): the reference's
    # headline suite reaches 1M rows (webbase-1M) and ~200-500k rows
    # (mac_econ_fwd500 206k, mc2depi 526k, scircuit 171k); these analogues
    # match each matrix's published row count / mean-degree regime.
    "webbase_1m": lambda: power_law(
        1_000_000, 1_000_000, alpha=2.2, max_deg=4096, seed=1
    ),  # 1M rows, nnz 4.4M (webbase-1M: 3.1M), skewed short rows
    "econ_206k": lambda: erdos_renyi(206500, 206500, 6.0, seed=2),
    #                     ^ mac_econ_fwd500: 206500 rows, mean ~6 nnz/row
    "mc2depi_524k": lambda: poisson2d(724),  # 524176 rows, 5-pt stencil
    "scircuit_256k": lambda: circuit(262144),
    # FEM-irregular family (VERDICT r2 missing #3 / next #8): cant/consph
    # analogues at two sizes + a pdb1HYS-like denser small one — irregular
    # ~40-80 nnz rows that exercise the mid-row ESC bin with NO regular
    # diagonal structure for the DIA path to exploit
    "fem_17k": lambda: fem(18, dof=3, fill=0.7, seed=3),   # 17496 rows
    "fem_32k": lambda: fem(22, dof=3, fill=0.7, seed=4),   # 31944 rows
    "pdb_8k": lambda: fem(14, dof=3, fill=0.9, seed=5),    # 8232 rows,
    #                      ^ denser blocks: ~73 nnz/row (pdb1HYS ~119)
    # irregular-mesh FEM (round 4): same row-length band as fem_17k but
    # with node ids permuted — thousands of distinct diagonals, so the
    # mid-row ESC path carries it (the TRUE unstructured-mesh cant
    # analogue now that the regular fem members ride DIA)
    "femirr_17k": lambda: fem_irregular(18, dof=3, fill=0.7, seed=3),
    # round-4 suite breadth (VERDICT r3 next #6): pattern-mtx end-to-end,
    # hub-row skew (mouse_gene), and a consph-scale FEM size
    "pattern_circuit_64k": lambda: pattern_mtx_roundtrip(65536, seed=9),
    "hubrows_32k": lambda: hub_rows(32768, 32768, seed=12),
    "fem_46k": lambda: fem(25, dof=3, fill=0.7, seed=6),   # 46875 rows
    # round-5 suite breadth (VERDICT r4 missing #2): the three regimes
    # still absent from the ~23-matrix published suite's coverage —
    # road-network ultra-short rows, small-world co-purchase graphs, and
    # a second mid-FEM density at consph's published scale (83k rows,
    # ~65 nnz/row; regular mesh, so it rides the FEM->DIA reroute like
    # its cant/pdb siblings)
    "road_1m": lambda: road_net(1000, seed=13),            # 1M rows
    "smallworld_400k": lambda: small_world(400_000, k=4, seed=14),
    "consph_83k": lambda: fem(30, dof=3, fill=0.8, seed=15),  # 81000 rows
}

# rectangular A @ B pairs (two operands — benched via the pair-aware loop)
SUITE_PAIRS = {
    "rect_96k_24k_48k": lambda: rect_pair(98304, 24576, 49152, seed=7),
}
