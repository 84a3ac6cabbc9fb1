"""Fused ADI sweep kernel: coefficient build + Thomas solve in one pass.

The generic path materializes (a, b, c, d) row arrays and round-trips
(c', d') through HBM (ops/pallas_tridiag.py).  This kernel instead:

* keeps the FULL line in VMEM (forward elimination into scratch, backward
  substitution in the same kernel — no HBM round-trip),
* builds the interior/boundary/identity rows on the fly from the advection
  field, the line-class mask and the BC-type mask (the RHS ``d`` — which
  needs cross-axis stencils — is precomputed by XLA and fused with the
  boundary-value folding),
* solves all four variables in one launch (variable index = grid dim 0),
* is axis-aware: blocks are cut along the sweep axis directly, so X and Y
  sweeps need no transposes; the Z sweep is invoked on swapaxes'd operands
  and XLA fuses those transposes into the producing/consuming elementwise
  ops (the reference's Z_as_Y trick, AdiSolver3D.cu:198-210, for free).

This is the analogue of the reference's fused matrix-build + Thomas CUDA
kernel (AdiSolver3D.cu:75-313) redesigned for VMEM residency and lane
vectorization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_common import (LANES, S_TILE, build_abc, ceil_to as _ceil_to,
                           decode_pk, make_row_ops, pack_masks)


def _kernel(scal_ref, adv_ref, pk_ref, d_ref, x_ref,
            cp_ref, dp_ref, *, n: int, sweep_axis: int, exact: bool):
    v = pl.program_id(2)   # var index innermost: shared blocks stay resident
    v_vis_h2 = scal_ref[0]
    t_vis_h2 = scal_ref[1]
    inv3dt = scal_ref[2]
    inv2h = scal_ref[3]
    vis = jnp.where(v == 3, t_vis_h2, v_vis_h2)
    b_int = inv3dt + 2.0 * vis
    row, set_row = make_row_ops(sweep_axis)

    def drow(p):
        if sweep_axis == 0:
            return d_ref[0, p]
        return d_ref[0, :, p, :]

    def build(p):
        cls, bcv, bct = decode_pk(row(pk_ref, p))
        bc = jnp.where(v == 3, bct, bcv)
        adv = row(adv_ref, p)
        a, b, c = build_abc(cls, bc == 1, adv * inv2h, vis, b_int, bc2d=False)
        return a, b, c, drow(p)

    def fwd(p, carry):
        c_prev, d_prev = carry
        a, b, c, d = build(p)
        a_eff = jnp.where(p == 0, 0.0, a)
        c_eff = jnp.where(p == n - 1, 0.0, c)   # reference zeroes c[n-1]
        denom = b - a_eff * c_prev
        if exact:
            c_new = c_eff / denom
            d_new = (d - d_prev * a_eff) / denom
        else:
            r = pl.reciprocal(denom, approx=False)
            c_new = c_eff * r
            d_new = (d - d_prev * a_eff) * r
        set_row(cp_ref, p, c_new)
        set_row(dp_ref, p, d_new)
        return c_new, d_new

    zero = jnp.zeros_like(row(adv_ref, 0))
    carry = (zero, zero)

    def fwd_body(p, carry):
        return fwd(p, carry)

    carry = jax.lax.fori_loop(0, n, fwd_body, carry)

    def bwd_body(q, x_next):
        p = n - 1 - q
        ci = row(cp_ref, p)
        di = row(dp_ref, p)
        x = di - ci * x_next
        if sweep_axis == 0:
            x_ref[0, p] = x
        else:
            x_ref[0, :, p, :] = x
        return x

    jax.lax.fori_loop(0, n, bwd_body, zero)


@functools.partial(jax.jit, static_argnames=("sweep_axis", "exact"))
def fused_sweep(adv, cls, bcv, bct, d4, scal, sweep_axis: int, exact: bool = True):
    """Solve the four ADI systems of one direction in a single fused kernel.

    adv/cls/bcv/bct: (A, B, C) field arrays; d4: (4, A, B, C) RHS with the
    boundary/identity d-values already folded in; scal: (4,) f32 =
    [v_vis_h2, t_vis_h2, 3/dt, 1/(2h)].  ``sweep_axis`` in {0, 1} — callers
    handle the Z sweep by swapping axes 1<->2 around this call (XLA fuses
    those transposes).  Returns x: (4, A, B, C).

    The three masks travel as one packed f32 array (cls + 4*bc_vel +
    8*bc_temp) to cut the kernel's strided-DMA input volume.
    """
    A, B, C = adv.shape
    n = (A, B)[sweep_axis]

    Cp = _ceil_to(C, LANES)
    # pad batch dims to the sublane tile
    Ap = A if sweep_axis == 0 else _ceil_to(A, S_TILE)
    Bp = _ceil_to(B, S_TILE) if sweep_axis == 0 else B

    def pad3(x, val=0.0):
        return jnp.pad(x, ((0, Ap - A), (0, Bp - B), (0, Cp - C)),
                       constant_values=val)

    advp = pad3(adv)
    pkp = pad3(pack_masks(cls, bcv, bct))    # padded rows become identity rows (cls 0)
    d4p = jnp.pad(d4, ((0, 0), (0, Ap - A), (0, Bp - B), (0, Cp - C)))

    c_chunks = Cp // LANES
    if sweep_axis == 0:
        blk = (Ap, S_TILE, LANES)
        s_chunks = Bp // S_TILE
        idx = lambda s, c, v: (0, s, c)
        line_shape = (Ap, S_TILE, LANES)
    else:
        blk = (S_TILE, Bp, LANES)
        s_chunks = Ap // S_TILE
        idx = lambda s, c, v: (s, 0, c)
        line_shape = (S_TILE, Bp, LANES)

    shared = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    per_var = pl.BlockSpec((1,) + blk, lambda s, c, v: (v,) + idx(s, c, v),
                           memory_space=pltpu.VMEM)

    x = pl.pallas_call(
        functools.partial(_kernel, n=n, sweep_axis=sweep_axis, exact=exact),
        grid=(s_chunks, c_chunks, 4),
        # virtual CPU meshes (MGPU_EMU analogue) run the same kernel through
        # the Pallas interpreter, so sharded-fused is testable off-TPU
        interpret=(jax.default_backend() != "tpu"),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal
            shared,                                   # adv
            shared,                                   # packed masks
            per_var,                                  # d4
        ],
        out_specs=per_var,
        out_shape=jax.ShapeDtypeStruct((4, Ap, Bp, Cp), adv.dtype),
        scratch_shapes=[pltpu.VMEM(line_shape, adv.dtype),
                        pltpu.VMEM(line_shape, adv.dtype)],
    )(scal, advp, pkp, d4p)

    return x[:, :A, :B, :C]
