"""Fused multi-plane DIA SpGEMM kernel (Pallas/Mosaic) — VERDICT r2 #6.

The XLA gather-form DIA product (ops/dia.dia_spgemm) computes each output
plane as an independent sum of shifted A-plane x B-plane terms. XLA fuses
each plane's sum, but every A plane is RE-READ from HBM once per B diagonal
it pairs with: measured traffic = 2 x terms + nd_c plane-streams vs the
(nd_a + nd_b + nd_c) minimum — a ~4x gap on poisson2d (sol 0.23) and worse
on stencil27 (sol 0.063).

This kernel blocks the column axis and keeps ALL planes VMEM-resident per
block, so each plane crosses HBM exactly once:

- grid over column blocks of ``bj`` lanes;
- A's padded planes are passed TWICE with block indices j and j+1 — their
  in-kernel concatenation is a (nd_a, 2*bj) window covering every shifted
  read (shift span <= bj), which sidesteps BlockSpec's no-overlap rule
  without manual DMA;
- per output plane: an unrolled sum of statically-shifted VMEM slices times
  the resident B planes (the shifts cost Mosaic lane rotations — VPU work,
  not HBM).

Dispatch: ops/dia.dia_spgemm(fused=None) AUTO-routes here only inside the
measured win region (large-n few-diagonal shapes — mc2depi 232→197 us; see
the ``fused is None`` gate in ops/dia.dia_spgemm for the exact
conditions); everywhere else the kernel loses or
crashes the Mosaic compile helper, so the gate stays conservative and
``fused=True`` remains available to force it.
The XLA gather form is the production path; this kernel is kept for the
mc2depi-like regime and as the interpret-mode oracle target
(tests/test_dia_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.dia import DIA


def _plan_terms(off_a, off_b):
    """Static term table: per output offset dc, the (slot_a, slot_b, d2)
    triples with d1 + d2 == dc."""
    a_slot = {d: s for s, d in enumerate(off_a)}
    off_c = sorted({d1 + d2 for d1 in off_a for d2 in off_b})
    terms = {dc: [] for dc in off_c}
    for s2, d2 in enumerate(off_b):
        for d1 in off_a:
            terms[d1 + d2].append((a_slot[d1], s2, d2))
    return off_c, terms


def dia_spgemm_fused(
    a: DIA, b: DIA, bj: int = 4096, interpret: bool = False
) -> DIA:
    """C = A @ B with one fused Pallas kernel (see module docstring).

    Requires shift span (pad_l + pad_r) <= bj; callers route through
    ops/dia.dia_spgemm which falls back to the XLA form otherwise.
    """
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a.shape} @ {b.shape}")
    out_dtype = jnp.result_type(a.dtype, b.dtype)
    off_c, terms = _plan_terms(a.offsets, b.offsets)
    if not off_c:
        return DIA(jnp.zeros((1, n), out_dtype), (0,), (m, n))

    d2_max, d2_min = max(b.offsets), min(b.offsets)
    pad_l = max(0, d2_max)
    # in-block read offset for term d2 is pad_l - d2 in [0, span]
    span = pad_l + max(0, -d2_min)
    if span > bj:
        raise ValueError(f"shift span {span} exceeds block {bj}")

    nb = -(-n // bj)
    n_pad = nb * bj
    nd_a, nd_b, nd_c = len(a.offsets), len(b.offsets), len(off_c)

    # A padded so every shifted block read is in bounds: left pad_l, right
    # up to (nb + 1) * bj total width (the j+1 window of the last block).
    # Rectangular inputs with k + pad_l beyond that window would overflow
    # the update below — widen to the next bj multiple (blocks past j+1 are
    # simply never read).
    a_w = max((nb + 1) * bj, -(-(k + pad_l) // bj) * bj)
    a_pad = jnp.zeros((nd_a, a_w), out_dtype)
    a_pad = jax.lax.dynamic_update_slice(
        a_pad, a.data.astype(out_dtype), (0, pad_l)
    )
    b_pad = jnp.zeros((nd_b, n_pad), out_dtype)
    b_pad = jax.lax.dynamic_update_slice(b_pad, b.data.astype(out_dtype), (0, 0))

    kernel = functools.partial(
        _dia_kernel, terms=terms, off_c=tuple(off_c), pad_l=pad_l, bj=bj
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nd_a, bj), lambda j: (0, j)),
            pl.BlockSpec((nd_a, bj), lambda j: (0, j + 1)),
            pl.BlockSpec((nd_b, bj), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((nd_c, bj), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nd_c, n_pad), out_dtype),
        interpret=interpret,
    )(a_pad, a_pad, b_pad)
    return DIA(out[:, :n], tuple(off_c), (m, n))


def _dia_kernel(a0_ref, a1_ref, b_ref, out_ref, *, terms, off_c, pad_l, bj):
    """One column block: all planes VMEM-resident.

    Sliced ONCE per B diagonal (cross-lane rotations are the expensive
    Mosaic op — and a per-TERM unroll of nd_a*nd_b slices crashed the
    compiler at 729 terms): each d2's shifted (nd_a, bj) window multiplies
    B's plane broadcast, then rows accumulate into their static output
    planes (sublane-aligned row reads, no further rotations)."""
    aw = jnp.concatenate([a0_ref[:], a1_ref[:]], axis=1)  # (nd_a, 2*bj)
    b_blk = b_ref[:]
    slot = {dc: i for i, dc in enumerate(off_c)}
    acc = [None] * len(off_c)
    # regroup the static term table by d2
    by_d2 = {}
    for dc, lst in terms.items():
        for s1, s2, d2 in lst:
            by_d2.setdefault((s2, d2), []).append((s1, dc))
    for (s2, d2), pairs in sorted(by_d2.items()):
        t0 = pad_l - d2  # static in [0, span] <= bj
        a_sh = jax.lax.slice(
            aw, (0, t0), (aw.shape[0], t0 + bj)
        )  # ONE rotation per d2
        contrib = a_sh * b_blk[s2][None, :]
        for s1, dc in pairs:
            ci = slot[dc]
            row = contrib[s1]
            acc[ci] = row if acc[ci] is None else acc[ci] + row
    for ci in range(len(off_c)):
        out_ref[ci, :] = acc[ci]
