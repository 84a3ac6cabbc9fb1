"""Shared row-build/decode logic for the fused sweep kernels.

Every fused Pallas kernel (pallas_sweep.py, pallas_sweep_dma.py,
pallas_sweep_long.py, pallas_sweep_stream.py) constructs the same
tridiagonal rows from the same packed mask encoding — the one BuildMatrix
everything shares in the reference (AdiSolver3D.cpp:732-802, ApplyBC0/1
:804-852; 2D forms AdiSolver2D.cpp:74-116).  This module is the single
source of truth so a BC fix lands in every backend at once (a fix applied
to one kernel but not the others would silently break the bitwise
backend-parity guarantees — round-2 self-review finding).

Everything here is trace-time code shared by kernel bodies and wrappers;
the expressions are kept byte-for-byte identical to the pre-dedup kernels
so all backends remain bitwise-unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp

from .masks import BC0, BC1, INTERIOR

LANES = 128
S_TILE = 8


def ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_masks(cls, bcv, bct):
    """One f32 mask array per cell: code = cls + 4*bc_vel + 8*bc_temp
    (integer-exact in f32 for codes 0..15) — cuts the kernels' mask input
    volume to a single field."""
    return (cls.astype(jnp.float32) + 4.0 * bcv.astype(jnp.float32)
            + 8.0 * bct.astype(jnp.float32))


def decode_pk(pk):
    """Invert pack_masks with floor arithmetic (works on rows or slabs)."""
    bct = jnp.floor(pk * 0.125)
    r8 = pk - 8.0 * bct
    bcv = jnp.floor(r8 * 0.25)
    cls = r8 - 4.0 * bcv
    return cls, bcv, bct


def pack_masks_dual(cls, bcv, bct, dual, take):
    """Extended encoding for dual-endpoint lines (the reference's
    MAX_SEGS_PER_ROW=2 case, Grid3D.h:43): code = cls + 4*bc_vel +
    8*bc_temp + 16*dual + 32*take_b — integer-exact in f32 for 0..63.
    ``dual``: the cell takes the BC0 (segment-start) role in pass B while
    cls holds its pass-A (BC1) role; ``take``: the stitched solution takes
    pass B's value here (ops/masks.line_class_3d)."""
    return (pack_masks(cls, bcv, bct)
            + 16.0 * dual.astype(jnp.float32)
            + 32.0 * take.astype(jnp.float32))


def decode_pk_dual(pk):
    """Invert pack_masks_dual: (cls_a, bcv, bct, dual, take)."""
    take = jnp.floor(pk * 0.03125)
    r32 = pk - 32.0 * take
    dual = jnp.floor(r32 * 0.0625)
    r16 = r32 - 16.0 * dual
    bct = jnp.floor(r16 * 0.125)
    r8 = r16 - 8.0 * bct
    bcv = jnp.floor(r8 * 0.25)
    cls = r8 - 4.0 * bcv
    return cls, bcv, bct, dual, take


def make_row_ops(sweep_axis: int, cast_f32: bool = False):
    """(row, set_row) accessors for slab-shaped refs: the sweep axis is the
    slab's major dim (sweep_axis == 0) or its middle dim (== 1).  With
    ``cast_f32`` reads upcast to f32 and writes downcast to the ref dtype
    (bf16 payload slabs; the Thomas recurrence always runs f32)."""
    if cast_f32:
        def row(ref, p):
            if sweep_axis == 0:
                return ref[p].astype(jnp.float32)
            return ref[:, p, :].astype(jnp.float32)

        def set_row(ref, p, val):
            val = val.astype(ref.dtype)
            if sweep_axis == 0:
                ref[p] = val
            else:
                ref[:, p, :] = val
    else:
        def row(ref, p):
            if sweep_axis == 0:
                return ref[p]
            return ref[:, p, :]

        def set_row(ref, p, val):
            if sweep_axis == 0:
                ref[p] = val
            else:
                ref[:, p, :] = val
    return row, set_row


def build_abc(cls, free, adv_2h, vis, b_int, bc2d: bool):
    """Tridiagonal row coefficients from the line-class and BC masks.

    Interior rows: a = -q/(2h) - nu/h^2, b = b_int, c = q/(2h) - nu/h^2
    (BuildMatrix, AdiSolver3D.cpp:732-802 / AdiSolver2D.cpp:118-178).
    Boundary rows: Dirichlet identity (1), or the FREE forms — 3D linear
    extrapolation (2, -1 | -1, 2) rows (ApplyBC0/1, AdiSolver3D.cpp:804-852)
    vs the 2D difference stencil x0-x1=0 (+1/-1 rows, AdiSolver2D.cpp:74-116).
    Identity rows elsewhere decouple the dense batched lines exactly.
    """
    interior = cls == INTERIOR
    is_bc0 = cls == BC0
    is_bc1 = cls == BC1
    if bc2d:
        a = jnp.where(interior, -adv_2h - vis,
                      jnp.where(is_bc1, jnp.where(free, 1.0, 0.0), 0.0))
        b = jnp.where(interior, b_int,
                      jnp.where(is_bc1, jnp.where(free, -1.0, 1.0), 1.0))
        c = jnp.where(interior, adv_2h - vis,
                      jnp.where(is_bc0, jnp.where(free, -1.0, 0.0), 0.0))
    else:
        a = jnp.where(interior, -adv_2h - vis,
                      jnp.where(is_bc1, jnp.where(free, -1.0, 0.0), 0.0))
        b = jnp.where(interior, b_int,
                      jnp.where(is_bc0 | is_bc1,
                                jnp.where(free, 2.0, 1.0), 1.0))
        c = jnp.where(interior, adv_2h - vis,
                      jnp.where(is_bc0, jnp.where(free, -1.0, 0.0), 0.0))
    return a, b, c


def build_a(cls, free, adv_2h, vis, bc2d: bool = False):
    """Just the sub-diagonal (for passes that re-derive only ``a``, e.g. the
    stream kernel's d-elimination reusing a shared (c', denom) chain)."""
    if bc2d:
        return jnp.where(cls == INTERIOR, -adv_2h - vis,
                         jnp.where(cls == BC1,
                                   jnp.where(free, 1.0, 0.0), 0.0))
    return jnp.where(cls == INTERIOR, -adv_2h - vis,
                     jnp.where(cls == BC1,
                               jnp.where(free, -1.0, 0.0), 0.0))
