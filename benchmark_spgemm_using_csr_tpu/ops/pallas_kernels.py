"""Pallas/Mosaic TPU kernels for the hot numeric phase.

The reference's numeric stage-3 kernels are hand-written CUDA (heap /
bitonic-ESC / merge-path, SURVEY.md §4). On TPU, Pallas→Mosaic is the
native-kernel layer (SURVEY.md §3 "native-component accounting"); this
module holds the kernels the XLA graph can't fuse well by itself.

``bin_sort_compress``: the per-bin numeric workhorse. Input is a dense
(rows, width) tile of gathered intermediate products (column ids + values,
invalid lanes carry the sentinel column ``n``). One kernel invocation does,
entirely in VMEM:

1. a batched **bitonic sort network** along the lane axis (the reference's
   bitonic-ESC sort, re-laid-out so every compare-exchange is a full-tile
   VPU op across all rows at once — no per-thread code);
2. a **segmented run-sum** over duplicate columns (log-step Hillis–Steele
   shifts) — the "compress" of ESC;
3. **unique-position** computation (exclusive scan of run-tail flags) so the
   caller can scatter results straight into C without materializing a
   compacted intermediate.

versus the XLA path (jax.lax.sort + ~6 elementwise/scan ops), every one of
which round-trips the (rows, width) tile through HBM. Here the tile is read
once and written once: the kernel is HBM-bandwidth-bound at 2 passes instead
of ~2*log2(width)+8.

On non-TPU backends the same kernel runs under ``interpret=True`` (used by
the CPU test suite; SURVEY.md §7.2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.csr import INDEX_DTYPE


def _lane_shift_right(x, k: int, fill):
    """x[i] -> x[i-k] along the lane (last) axis, filling the first k lanes.

    Implemented with a static roll + iota mask (pltpu.roll wraps; the wrap
    region is exactly the first k lanes)."""
    if k == 0:
        return x
    rolled = pltpu.roll(x, shift=k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < k, fill, rolled)


def _bitonic_stage(col, val, stride: int, size: int):
    """One compare-exchange stage of the bitonic network, vectorized over
    all rows: partner lane = lane XOR stride, direction from bit ``size``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    is_lower = (lane & stride) == 0
    # partner = lane ^ stride: +stride where the bit is clear, -stride where
    # set — expressible as two static rolls selected per lane (wrap lanes are
    # never selected).
    width = col.shape[1]
    # roll requires non-negative shifts; -stride ≡ width - stride (wrap).
    col_p = jnp.where(
        is_lower,
        pltpu.roll(col, shift=width - stride, axis=1),
        pltpu.roll(col, shift=stride, axis=1),
    )
    val_p = jnp.where(
        is_lower,
        pltpu.roll(val, shift=width - stride, axis=1),
        pltpu.roll(val, shift=stride, axis=1),
    )
    asc = (lane & size) == 0
    # lexicographic (col, val) so both partners make consistent decisions on
    # column ties (identical pairs are exchange-invariant).
    less = (col < col_p) | ((col == col_p) & (val < val_p))
    take_min = is_lower == asc
    keep = take_min == less  # keep own value iff it is the wanted extreme
    return jnp.where(keep, col, col_p), jnp.where(keep, val, val_p)


def _sort_compress_kernel(col_ref, val_ref, ocol_ref, oval_ref, pos_ref, cnt_ref,
                          *, width: int, n_sentinel: int):
    col = col_ref[...]
    val = val_ref[...]

    # --- 1. bitonic sort along lanes (ascending; sentinel n sorts last) ----
    size = 2
    while size <= width:
        stride = size // 2
        while stride >= 1:
            col, val = _bitonic_stage(col, val, stride, size)
            stride //= 2
        size *= 2

    # --- 2. segmented run-sum of duplicate columns (Hillis–Steele) --------
    run_val = val
    k = 1
    while k < width:
        shifted = _lane_shift_right(run_val, k, jnp.zeros((), val.dtype))
        same = col == _lane_shift_right(col, k, -jnp.ones((), col.dtype))
        # contiguity of equal keys after sort makes run-masking exact,
        # provided the carry chain is unbroken: same[i] here means
        # col[i] == col[i-k]; since equal cols are contiguous this holds for
        # the whole run prefix — the classic segmented inclusive scan.
        run_val = run_val + jnp.where(same, shifted, jnp.zeros((), val.dtype))
        k *= 2

    # --- 3. run tails hold the full sum; position = excl. scan of tails ---
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    col_next = jnp.where(
        lane == width - 1,
        jnp.full((), n_sentinel, col.dtype),
        pltpu.roll(col, shift=width - 1, axis=1),
    )
    valid = col < n_sentinel
    is_tail = valid & ((col != col_next) | (lane == width - 1))

    # exclusive scan of is_tail along lanes (log-step adds)
    run = is_tail.astype(jnp.int32)
    k = 1
    while k < width:
        run = run + _lane_shift_right(run, k, jnp.zeros((), jnp.int32))
        k *= 2
    pos = run - 1  # inclusive -> index of this tail among tails

    ocol_ref[...] = jnp.where(is_tail, col, n_sentinel)
    oval_ref[...] = jnp.where(is_tail, run_val, jnp.zeros((), val.dtype))
    pos_ref[...] = jnp.where(is_tail, pos, width).astype(jnp.int32)
    cnt_ref[...] = jnp.max(jnp.where(is_tail, run, 0), axis=1, keepdims=True).astype(
        jnp.int32
    )


@functools.partial(
    jax.jit, static_argnames=("n_sentinel", "block_rows", "interpret")
)
def bin_sort_compress(
    col: jax.Array,
    val: jax.Array,
    *,
    n_sentinel: int,
    block_rows: int = 0,
    interpret: bool = False,
):
    """Fused sort + duplicate-merge + position pass over a (rows, width)
    product tile. width must be a power of two.

    Returns (cols, vals, pos, counts):
      cols/vals: run-tail entries (unique columns, merged values), others
                 sentinel / 0;
      pos:       per-entry unique index within its row (width => drop);
      counts:    (rows,) exact per-row nnzC.
    """
    r, width = col.shape
    if width & (width - 1):
        raise ValueError(f"width {width} must be a power of two")
    if not block_rows:
        # VMEM budget: ~6 live (block, width) tiles * 4B, against the 16 MB
        # scoped-vmem limit. VMEM tiles pad the lane dim to 128, so narrow
        # widths still cost 128 lanes per row. Power-of-two floor so the
        # divisibility loop converges to a useful divisor.
        eff_width = max(width, 128)
        block_rows = max(min(r, (4 * 1024 * 1024) // (eff_width * 4 * 6)), 8)
        # same scoped-VMEM cap as tile_sort_merge (Mosaic stacks per-stage
        # bitonic relayout temporaries ~4x beyond the live-tile estimate)
        block_rows = min(block_rows, (16 << 20) // (eff_width * 4 * 6 * 4))
        block_rows = 1 << (block_rows.bit_length() - 1)
        while r % block_rows:
            block_rows //= 2
        block_rows = max(block_rows, 1)
    grid = (r // block_rows,)
    kernel = functools.partial(
        _sort_compress_kernel, width=width, n_sentinel=n_sentinel
    )
    spec = pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    cnt_spec = pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                            memory_space=pl.ANY if interpret else pltpu.VMEM)
    ocol, oval, pos, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec, cnt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r, width), col.dtype),
            jax.ShapeDtypeStruct((r, width), val.dtype),
            jax.ShapeDtypeStruct((r, width), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ),
        interpret=interpret,
    )(col, val)
    return ocol, oval, pos, cnt[:, 0].astype(INDEX_DTYPE)


def _tile_sort_merge_kernel(key_ref, val_ref, okey_ref, oval_ref, pos_ref,
                            cnt_ref, *, width: int, wlr: int, cbits: int,
                            sentinel: int):
    """bin_sort_compress variant for PACKED tiles: one tile row holds
    several complete C rows, keyed (local_row << cbits | col). Extra
    output: per-(tile, local_row) tail counts, from which the caller
    derives C.rowptr without any per-entry scatter."""
    key = key_ref[...]
    val = val_ref[...]

    size = 2
    while size <= width:
        stride = size // 2
        while stride >= 1:
            key, val = _bitonic_stage(key, val, stride, size)
            stride //= 2
        size *= 2

    run_val = val
    k = 1
    while k < width:
        shifted = _lane_shift_right(run_val, k, jnp.zeros((), val.dtype))
        same = key == _lane_shift_right(key, k, -jnp.ones((), key.dtype))
        run_val = run_val + jnp.where(same, shifted, jnp.zeros((), val.dtype))
        k *= 2

    lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    key_next = jnp.where(
        lane == width - 1,
        jnp.full((), sentinel, key.dtype),
        pltpu.roll(key, shift=width - 1, axis=1),
    )
    valid = key < sentinel
    is_tail = valid & ((key != key_next) | (lane == width - 1))

    run = is_tail.astype(jnp.int32)
    k = 1
    while k < width:
        run = run + _lane_shift_right(run, k, jnp.zeros((), jnp.int32))
        k *= 2
    pos = run - 1

    okey_ref[...] = jnp.where(is_tail, key, sentinel)
    oval_ref[...] = jnp.where(is_tail, run_val, jnp.zeros((), val.dtype))
    pos_ref[...] = jnp.where(is_tail, pos, width).astype(jnp.int32)

    # per-local-row tail counts: wlr masked lane reductions (lr comes from
    # the key's high bits; sentinel lanes fail is_tail so need no masking)
    lr = jax.lax.shift_right_logical(key, cbits)
    tail_i = is_tail.astype(jnp.int32)
    cols = [
        jnp.sum(jnp.where(lr == j, tail_i, 0), axis=1, keepdims=True)
        for j in range(wlr)
    ]
    cnt_ref[...] = jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("sentinel", "wlr", "cbits", "block_rows", "interpret"),
)
def tile_sort_merge(
    key: jax.Array,
    val: jax.Array,
    *,
    sentinel: int,
    wlr: int,
    cbits: int,
    block_rows: int = 0,
    interpret: bool = False,
):
    """Fused sort + duplicate-merge + positions + per-local-row counts over
    a (tiles, width) PACKED product tile (several complete C rows per tile
    row, key = local_row << cbits | col; invalid lanes carry ``sentinel``).
    width must be a power of two.

    Returns (keys, vals, pos, counts):
      keys/vals: run-tail entries (merged values), others sentinel / 0;
      pos:       per-entry tail index within its tile (width => drop);
      counts:    (tiles, wlr) exact per-(tile, local_row) nnzC.
    """
    r, width = key.shape
    if width & (width - 1):
        raise ValueError(f"width {width} must be a power of two")
    if not block_rows:
        # 8 MB working-set target: block 256 at W=1024 measured fastest
        # (1248 M elem/s vs 1173 at the 4 MB default's 128 — block sweep
        # at the er_medium production shape, 2026-08-18)
        eff_width = max(width, 128)
        block_rows = max(min(r, (8 * 1024 * 1024) // (eff_width * 4 * 6)), 8)
        # Scoped-VMEM cap, calibrated on the compile helper (Mosaic stacks
        # per-stage temporaries far beyond the live-tile estimate, and the
        # multiplier is width-dependent): at W=128 a 1 MB block demands
        # 27.8 MB (OOM — road_1m A/B 2026-08-21; 512 KB compiles), at
        # W=256 a 1 MB block demanded 24.5 MB (econ 2026-08-19; 512 KB is
        # the production config), while at W=1024 the measured-best 1 MB
        # block (er, 256 rows) fits. Cap block bytes accordingly.
        cap_bytes = (1 << 20) if eff_width >= 1024 else (512 << 10)
        block_rows = min(block_rows, cap_bytes // (eff_width * 4))
        block_rows = 1 << (block_rows.bit_length() - 1)
        while r % block_rows:
            block_rows //= 2
        block_rows = max(block_rows, 1)
    grid = (r // block_rows,)
    kernel = functools.partial(
        _tile_sort_merge_kernel, width=width, wlr=wlr, cbits=cbits,
        sentinel=sentinel,
    )
    spec = pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    cnt_spec = pl.BlockSpec((block_rows, wlr), lambda i: (i, 0),
                            memory_space=pl.ANY if interpret else pltpu.VMEM)
    okey, oval, pos, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec, cnt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r, width), key.dtype),
            jax.ShapeDtypeStruct((r, width), val.dtype),
            jax.ShapeDtypeStruct((r, width), jnp.int32),
            jax.ShapeDtypeStruct((r, wlr), jnp.int32),
        ),
        interpret=interpret,
    )(key, val)
    return okey, oval, pos, cnt


def supports_pallas() -> bool:
    """True when a real TPU backend is available for compiled Pallas."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
