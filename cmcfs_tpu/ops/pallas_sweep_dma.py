"""Manual-DMA fused ADI sweep: the bandwidth-optimized variant.

The BlockSpec-driven kernel (pallas_sweep.py) lets Pallas fetch blocks that
slice the middle grid dimensions, which degenerates into 512B–4KB strided
DMAs (~120 GB/s measured — a plain block copy of 4x256^3 costs ~9 ms).
This kernel keeps the field arrays in HBM and issues explicit slab DMAs:

* sweep axis 0 (X): slabs  [:, 8j:8j+8, :]  — A chunks of 8*C*4 bytes,
* sweep axis 1 (Y): slabs  [8j:8j+8, :, :]  — one fully contiguous chunk,

with the per-variable RHS/solution slabs double-buffered against compute.
All four variables are solved inside one grid step so the shared slabs
(advection + packed masks) are DMA'd once.  Same numerics as
pallas_sweep._kernel (same row build, same Thomas order).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_common import (LANES, S_TILE, build_abc, ceil_to as _ceil_to,
                           decode_pk, make_row_ops, pack_masks)


def _solve_var(v, adv_v, pk_v, d_v, x_v, cp, dp, scal_ref, n, sweep_axis,
               exact, t_var=3, bc2d=False):
    v_vis_h2 = scal_ref[0]
    t_vis_h2 = scal_ref[1]
    inv3dt = scal_ref[2]
    inv2h = scal_ref[3]
    vis = t_vis_h2 if v == t_var else v_vis_h2
    b_int = inv3dt + 2.0 * vis
    # storage may be bf16 (half the HBM traffic); Thomas runs in f32
    row, set_row = make_row_ops(sweep_axis, cast_f32=True)

    def build(p):
        cls, bcv, bct = decode_pk(row(pk_v, p))
        bc = bct if v == t_var else bcv
        adv = row(adv_v, p)
        a, b, c = build_abc(cls, bc == 1, adv * inv2h, vis, b_int, bc2d)
        return a, b, c, row(d_v, p)

    def fwd_body(p, carry):
        c_prev, d_prev = carry
        a, b, c, d = build(p)
        a_eff = jnp.where(p == 0, 0.0, a)
        c_eff = jnp.where(p == n - 1, 0.0, c)
        denom = b - a_eff * c_prev
        if exact:
            c_new = c_eff / denom
            d_new = (d - d_prev * a_eff) / denom
        else:
            r = pl.reciprocal(denom, approx=False)
            c_new = c_eff * r
            d_new = (d - d_prev * a_eff) * r
        set_row(cp, p, c_new)
        set_row(dp, p, d_new)
        return c_new, d_new

    zero = jnp.zeros_like(row(adv_v, 0))
    jax.lax.fori_loop(0, n, fwd_body, (zero, zero))

    def bwd_body(q, x_next):
        p = n - 1 - q
        x = row(dp, p) - row(cp, p) * x_next
        set_row(x_v, p, x)
        return x

    jax.lax.fori_loop(0, n, bwd_body, zero)


def _make_kernel(n, sweep_axis, exact, bf16=False, s_tile=S_TILE, nvars=4,
                 t_var=3, bc2d=False):
    """``bf16``: the per-variable payload (RHS in, solution out — 8 of the 10
    slabs per grid step) is stored bf16 in HBM, halving its traffic.  Mosaic
    cannot issue sub-lane-strided bf16 row loads, so bf16 slabs are staged
    through one full-slab (tile-aligned) cast to/from f32 work buffers; the
    Thomas recurrence always runs in f32."""
    def body(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm,
             adv_v, pk_v, d_v, x_v, cp, dp, in_sems, out_sems, sh_sems,
             df=None, xf=None):
        j = pl.program_id(0)
        n_blocks = pl.num_programs(0)
        # cross-block software pipeline: the shared slabs (and, for even
        # nvars, the first RHS slab) of block j+1 stream in while block j
        # computes, and block j's final output DMAs drain during block j+1
        # — only the very first input and very last output are exposed.
        jp = jax.lax.rem(j, 2)

        def slab(ref, blk):
            if sweep_axis == 0:
                return ref.at[:, pl.ds(blk * s_tile, s_tile), :]
            return ref.at[pl.ds(blk * s_tile, s_tile), :, :]

        def d_slab(vv, blk):
            if sweep_axis == 0:
                return d_hbm.at[vv, :, pl.ds(blk * s_tile, s_tile), :]
            return d_hbm.at[vv, pl.ds(blk * s_tile, s_tile), :, :]

        def x_slab(vv, blk=None):
            blk = j if blk is None else blk
            if sweep_axis == 0:
                return x_hbm.at[vv, :, pl.ds(blk * s_tile, s_tile), :]
            return x_hbm.at[vv, pl.ds(blk * s_tile, s_tile), :, :]

        def start_shared(blk, par):
            pltpu.make_async_copy(slab(adv_hbm, blk), adv_v.at[par],
                                  sh_sems.at[par, 0]).start()
            pltpu.make_async_copy(slab(pk_hbm, blk), pk_v.at[par],
                                  sh_sems.at[par, 1]).start()

        @pl.when(j == 0)
        def _():
            start_shared(j, jp)
            pltpu.make_async_copy(d_slab(0, j), d_v.at[0],
                                  in_sems.at[0]).start()

        @pl.when(j + 1 < n_blocks)
        def _():
            start_shared(j + 1, 1 - jp)

        pltpu.make_async_copy(slab(adv_hbm, j), adv_v.at[jp],
                              sh_sems.at[jp, 0]).wait()
        pltpu.make_async_copy(slab(pk_hbm, j), pk_v.at[jp],
                              sh_sems.at[jp, 1]).wait()

        for v in range(nvars):
            dslot = v % 2
            pltpu.make_async_copy(d_slab(v, j), d_v.at[dslot],
                                  in_sems.at[dslot]).wait()
            if v + 1 < nvars:
                pltpu.make_async_copy(d_slab(v + 1, j), d_v.at[1 - dslot],
                                      in_sems.at[1 - dslot]).start()
            elif nvars % 2 == 0:
                # even nvars: d slot 0 is free after var nvars-2's solve —
                # prefetch the next block's d0 behind the final var's solve
                @pl.when(j + 1 < n_blocks)
                def _():
                    pltpu.make_async_copy(d_slab(0, j + 1), d_v.at[0],
                                          in_sems.at[0]).start()
            if bf16:
                df[...] = d_v[dslot].astype(jnp.float32)
            xslot = v % 2
            if v >= 2:
                # x buffer reuse: the out-DMA started two vars ago used it
                pltpu.make_async_copy(x_v.at[xslot], x_slab(v - 2),
                                      out_sems.at[xslot]).wait()
            else:
                # the buffer's last out-DMA belongs to the previous block:
                # whichever of its final two vars shares this slot parity
                prev_v = (nvars - 1 if (nvars - 1) % 2 == v % 2
                          else nvars - 2)

                @pl.when(j > 0)
                def _():
                    pltpu.make_async_copy(x_v.at[xslot], x_slab(prev_v, j - 1),
                                          out_sems.at[xslot]).wait()
            _solve_var(v, adv_v.at[jp], pk_v.at[jp],
                       df if bf16 else d_v.at[dslot],
                       xf if bf16 else x_v.at[xslot], cp, dp,
                       scal_ref, n, sweep_axis, exact, t_var, bc2d)
            if bf16:
                x_v[xslot] = xf[...].astype(x_v.dtype)
            pltpu.make_async_copy(x_v.at[xslot], x_slab(v),
                                  out_sems.at[xslot]).start()

        if nvars % 2:
            # odd nvars: d slot 0's last reader was the final var's solve, so
            # the next block's d0 can only start now (it still overlaps the
            # final output DMAs and the next block's shared-slab waits)
            @pl.when(j + 1 < n_blocks)
            def _():
                pltpu.make_async_copy(d_slab(0, j + 1), d_v.at[0],
                                      in_sems.at[0]).start()

        @pl.when(j == n_blocks - 1)
        def _():
            for vv in range(max(0, nvars - 2), nvars):
                pltpu.make_async_copy(x_v.at[vv % 2], x_slab(vv),
                                      out_sems.at[vv % 2]).wait()

    if bf16:
        def kernel(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm,
                   adv_v, pk_v, d_v, x_v, df, xf, cp, dp,
                   in_sems, out_sems, sh_sems):
            body(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm,
                 adv_v, pk_v, d_v, x_v, cp, dp, in_sems, out_sems, sh_sems,
                 df=df, xf=xf)
    else:
        def kernel(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm,
                   adv_v, pk_v, d_v, x_v, cp, dp,
                   in_sems, out_sems, sh_sems):
            body(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm,
                 adv_v, pk_v, d_v, x_v, cp, dp, in_sems, out_sems, sh_sems)
    return kernel


def _pick_s_tile() -> int:
    """Default slab thickness, overridable via env CMCFS_S_TILE for tuning.

    Measured (interleaved bench A/B, 256^3 ng=4 nl=2, 2026-08-16): s_tile=8
    wins at the *step* level (54.0e6 vs 49.5e6 cell-upd/s for 32, -8%) even
    though an isolated-kernel microbench slightly favors 32 — with only 8
    grid blocks the first-block DMA exposure and the lost cross-block
    pipelining outweigh the 4x lower DMA count."""
    return int(os.environ.get("CMCFS_S_TILE", "0")) or S_TILE


def fused_sweep_dma(adv, cls, bcv, bct, d4, scal, sweep_axis: int,
                    exact: bool = True, s_tile: int | None = None,
                    t_var: int | None = None, bc2d: bool = False):
    # resolve the env-tunable default OUTSIDE the jit boundary so changing
    # CMCFS_S_TILE between calls is not swallowed by the trace cache
    if s_tile is None:
        s_tile = _pick_s_tile()
    return _fused_sweep_dma(adv, cls, bcv, bct, d4, scal,
                            sweep_axis=sweep_axis, exact=exact,
                            s_tile=s_tile, t_var=t_var, bc2d=bc2d)


@functools.partial(jax.jit, static_argnames=("sweep_axis", "exact", "s_tile",
                                             "t_var", "bc2d"))
def _fused_sweep_dma(adv, cls, bcv, bct, d4, scal, sweep_axis: int,
                     exact: bool = True, s_tile: int = S_TILE,
                     t_var: int | None = None, bc2d: bool = False):
    """Drop-in equivalent of pallas_sweep.fused_sweep with manual slab DMA.

    ``s_tile``: slab thickness along the batch (grid) dimension — bigger
    slabs mean fewer, larger DMAs (this pool chip is DMA-latency-bound) at
    the cost of proportionally more VMEM.  None means the measured default
    (8; override for tuning via env CMCFS_S_TILE — see _pick_s_tile).
    ``t_var``/``bc2d``: variable count follows d4.shape[0]; t_var is the
    temperature row index (t_vis + temp-BC codes) and bc2d selects the 2D
    boundary-row forms — this lets the 2D solver (3 vars) run the same
    kernel."""
    nvars = d4.shape[0]
    if t_var is None:
        t_var = nvars - 1
    A, B, C = adv.shape
    # pad every dim: padded cells are identity rows (cls 0, d 0) which pass
    # the Thomas carries through unchanged, so padding the sweep length is
    # safe (the real last row's c is already 0 by construction)
    Cp = _ceil_to(C, LANES)
    Ap = _ceil_to(A, s_tile if sweep_axis == 1 else S_TILE)
    Bp = _ceil_to(B, s_tile if sweep_axis == 0 else S_TILE)
    n = (Ap, Bp)[sweep_axis]

    def pad3(x):
        return jnp.pad(x, ((0, Ap - A), (0, Bp - B), (0, Cp - C)))

    advp = pad3(adv)
    pkp = pad3(pack_masks(cls, bcv, bct))
    d4p = jnp.pad(d4, ((0, 0), (0, Ap - A), (0, Bp - B), (0, Cp - C)))

    # storage dtype of the per-variable payload (RHS/solution) follows d4;
    # adv/packed stay f32 (casting them would just add an extra HBM
    # materialization — they are read straight from the f32 fields)
    bf16 = d4.dtype == jnp.bfloat16

    slab_shape = (Ap, s_tile, Cp) if sweep_axis == 0 else (s_tile, Bp, Cp)
    n_blocks = (Bp if sweep_axis == 0 else Ap) // s_tile

    scratch = [
        pltpu.VMEM((2,) + slab_shape, jnp.float32),  # adv (block-parity 2x)
        pltpu.VMEM((2,) + slab_shape, jnp.float32),  # packed (block-parity)
        pltpu.VMEM((2,) + slab_shape, d4.dtype),     # d double buffer
        pltpu.VMEM((2,) + slab_shape, d4.dtype),     # x double buffer
    ]
    if bf16:
        scratch += [pltpu.VMEM(slab_shape, jnp.float32),   # df work copy
                    pltpu.VMEM(slab_shape, jnp.float32)]   # xf work copy
    scratch += [
        pltpu.VMEM(slab_shape, jnp.float32),       # cp (f32 carries)
        pltpu.VMEM(slab_shape, jnp.float32),       # dp
        pltpu.SemaphoreType.DMA((2,)),      # in_sems
        pltpu.SemaphoreType.DMA((2,)),      # out_sems
        pltpu.SemaphoreType.DMA((2, 2)),    # sh_sems [parity, adv|pk]
    ]
    import math
    slab_elems = math.prod(slab_shape)
    # adv(2x) + pk(2x) + cp + dp f32; d + x double-buffered at payload
    # dtype; bf16 adds the df/xf f32 work slabs
    scratch_bytes = slab_elems * (6 * 4 + 4 * d4.dtype.itemsize
                                  + (8 if bf16 else 0))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    x = pl.pallas_call(
        _make_kernel(n, sweep_axis, exact, bf16, s_tile, nvars, t_var, bc2d),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  any_spec, any_spec, any_spec],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((nvars, Ap, Bp, Cp), d4.dtype),
        scratch_shapes=scratch,
        # bigger slabs need more than the 16MB default scoped-VMEM budget
        # (v5e has 128MB physical); grant what the scratch actually needs
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(110 * 1024 * 1024,
                                 max(32 * 1024 * 1024,
                                     int(scratch_bytes * 1.4)))),
        interpret=(jax.default_backend() != "tpu"),
    )(scal, advp, pkp, d4p)

    return x[:, :A, :B, :C]
