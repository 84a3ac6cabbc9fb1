"""Manual-DMA fused ADI sweep with in-kernel merges (full-fusion variant).

Extends the fused build+solve with the per-direction layer updates fused
into the kernel (reference UpdateSegment + MergeLayerTo with
INTERNAL_MERGE_ENABLE, AdiSolver3D.cpp:707-730, 664-683, .cu:315-374):

    out_new  = where(row is a segment cell, x, out_prev)
    temp_new = where(cell is NODE_IN, (temp + out_new)/2, temp)

so the separate XLA merge passes (~20 field-moves per direction iteration)
disappear.  Round-2 rewrite: contiguous full-C slabs (leading-dim-only HBM
slicing), every stream double-buffered IN TIME rather than in space —
d prefetches one variable ahead, out/temp-new DMAs drain while the next
variable's inputs load — and the outputs alias their inputs (out_prev IS
the output layer, temp_new overwrites temp), cutting both HBM footprint
and serialization.  The round-1 version serialized all slab DMAs and lost
to fused_dma + XLA merges; this one keeps exactly 7 slab buffers resident.

Not used when dual endpoints exist (the two-pass stitch needs raw x) or
when interior rows differ from NODE_IN for the axis (callers check
merge_ok).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masks import BC0, BC1, INTERIOR

LANES = 128
S_TILE = 8
VMEM_BUDGET = 15 * 2 ** 20


def fits(n_sweep: int, n_other: int) -> bool:
    """True if 7 full-C slabs of this direction fit in VMEM."""
    cp = -(-n_other // LANES) * LANES
    np_ = -(-n_sweep // S_TILE) * S_TILE
    return 7 * S_TILE * np_ * cp * 4 <= VMEM_BUDGET


def _make_kernel(n, sweep_axis, exact):
    def row(ref, p):
        if sweep_axis == 0:
            return ref[p]
        return ref[:, p, :]

    def set_row(ref, p, val):
        if sweep_axis == 0:
            ref[p] = val
        else:
            ref[:, p, :] = val

    # op_hbm aliases out_hbm and tp_hbm aliases tn_hbm
    # (input_output_aliases): each variable's slab is read strictly before
    # it is overwritten, and distinct variables touch disjoint regions
    def kernel(scal_ref, adv_hbm, pk_hbm, d_hbm, op_hbm, tp_hbm,
               out_hbm, tn_hbm,
               adv_v, pk_v, d_v, op_v, tp_v, x_v, cp,
               sh_sems, in_sems, out_sems):
        j = pl.program_id(0)
        v_vis_h2 = scal_ref[0]
        t_vis_h2 = scal_ref[1]
        inv3dt = scal_ref[2]
        inv2h = scal_ref[3]

        def slab3(ref):
            if sweep_axis == 0:
                return ref.at[:, pl.ds(j * S_TILE, S_TILE), :]
            return ref.at[pl.ds(j * S_TILE, S_TILE), :, :]

        def slab4(ref, vv):
            if sweep_axis == 0:
                return ref.at[vv, :, pl.ds(j * S_TILE, S_TILE), :]
            return ref.at[vv, pl.ds(j * S_TILE, S_TILE), :, :]

        a_dma = pltpu.make_async_copy(slab3(adv_hbm), adv_v, sh_sems.at[0])
        p_dma = pltpu.make_async_copy(slab3(pk_hbm), pk_v, sh_sems.at[1])
        a_dma.start()
        p_dma.start()
        pltpu.make_async_copy(slab4(d_hbm, 0), d_v, in_sems.at[0]).start()
        a_dma.wait()
        p_dma.wait()

        for v in range(4):
            if v > 0:
                # temp-new / out DMAs of the previous variable still drain
                pltpu.make_async_copy(tp_v, slab4(tn_hbm, v - 1),
                                      out_sems.at[1]).wait()
            pltpu.make_async_copy(slab4(tp_hbm, v), tp_v,
                                  in_sems.at[1]).start()
            pltpu.make_async_copy(slab4(op_hbm, v), op_v,
                                  in_sems.at[2]).start()
            if v > 0:
                pltpu.make_async_copy(x_v, slab4(out_hbm, v - 1),
                                      out_sems.at[0]).wait()
            pltpu.make_async_copy(slab4(d_hbm, v), d_v, in_sems.at[0]).wait()

            vis = jnp.where(v == 3, t_vis_h2, v_vis_h2)
            b_int = inv3dt + 2.0 * vis

            def fwd_body(p, carry):
                c_prev, d_prev = carry
                pk = row(pk_v, p)
                bct = jnp.floor(pk * 0.125)
                r8 = pk - 8.0 * bct
                bcv = jnp.floor(r8 * 0.25)
                cls = r8 - 4.0 * bcv
                bc = jnp.where(v == 3, bct, bcv)
                adv = row(adv_v, p)
                interior = cls == INTERIOR
                is_bc0 = cls == BC0
                is_bc1 = cls == BC1
                free = bc == 1
                adv_2h = adv * inv2h
                a = jnp.where(interior, -adv_2h - vis,
                              jnp.where(is_bc1,
                                        jnp.where(free, -1.0, 0.0), 0.0))
                b = jnp.where(interior, b_int,
                              jnp.where(is_bc0 | is_bc1,
                                        jnp.where(free, 2.0, 1.0), 1.0))
                c = jnp.where(interior, adv_2h - vis,
                              jnp.where(is_bc0,
                                        jnp.where(free, -1.0, 0.0), 0.0))
                d = row(d_v, p)
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
                set_row(x_v, p, d_new)       # x buffer stages d' during fwd
                return c_new, d_new

            zero = jnp.zeros_like(row(adv_v, 0))

            def fwd_chunk(k, carry):
                base = k * 8
                for i in range(8):
                    carry = fwd_body(base + i, carry)
                return carry

            jax.lax.fori_loop(0, n // 8, fwd_chunk, (zero, zero))
            if v + 1 <= 3:
                # d buffer is consumed; prefetch the next variable's RHS
                pltpu.make_async_copy(slab4(d_hbm, v + 1), d_v,
                                      in_sems.at[0]).start()

            def bwd_body(q, x_next):
                p = n - 1 - q
                x = row(x_v, p) - row(cp, p) * x_next
                set_row(x_v, p, x)           # d' -> x in place
                return x

            def bwd_chunk(k, x_next):
                base = k * 8
                for i in range(8):
                    x_next = bwd_body(base + i, x_next)
                return x_next

            jax.lax.fori_loop(0, n // 8, bwd_chunk, zero)

            pltpu.make_async_copy(slab4(tp_hbm, v), tp_v,
                                  in_sems.at[1]).wait()
            pltpu.make_async_copy(slab4(op_hbm, v), op_v,
                                  in_sems.at[2]).wait()

            # vectorized UpdateSegment + merge, in static row chunks to
            # bound the temporaries' VMEM stack footprint
            for m in range(4):
                sl = ((slice(m * n // 4, (m + 1) * n // 4),)
                      if sweep_axis == 0 else
                      (slice(None), slice(m * n // 4, (m + 1) * n // 4)))
                pk = pk_v[sl]
                r8 = pk - 8.0 * jnp.floor(pk * 0.125)
                cls = r8 - 4.0 * jnp.floor(r8 * 0.25)
                written = cls != 0.0
                is_in = cls == INTERIOR     # caller guarantees == NODE_IN
                out_new = jnp.where(written, x_v[sl], op_v[sl])
                t_old = tp_v[sl]
                x_v[sl] = out_new
                tp_v[sl] = jnp.where(is_in, (t_old + out_new) * 0.5, t_old)

            pltpu.make_async_copy(x_v, slab4(out_hbm, v),
                                  out_sems.at[0]).start()
            pltpu.make_async_copy(tp_v, slab4(tn_hbm, v),
                                  out_sems.at[1]).start()

        pltpu.make_async_copy(x_v, slab4(out_hbm, 3), out_sems.at[0]).wait()
        pltpu.make_async_copy(tp_v, slab4(tn_hbm, 3), out_sems.at[1]).wait()

    return kernel


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("sweep_axis", "exact"))
def fused_sweep_merge(adv, cls, bcv, bct, d4, out_prev4, temp4, scal,
                      sweep_axis: int, exact: bool = True):
    """Returns (out_new4, temp_new4): solved+merged direction layers.

    Requirement (3D semantics): interior rows correspond exactly to NODE_IN
    cells (no dropped runs) — guaranteed whenever cls has no dual endpoints
    and no boundary-touching runs; callers fall back otherwise.
    """
    A, B, C = adv.shape
    Cp = _ceil_to(C, LANES)
    Ap = _ceil_to(A, S_TILE)
    Bp = _ceil_to(B, S_TILE)
    n = (Ap, Bp)[sweep_axis]

    def pad3(x):
        return jnp.pad(x, ((0, Ap - A), (0, Bp - B), (0, Cp - C)))

    def pad4(x):
        return jnp.pad(x, ((0, 0), (0, Ap - A), (0, Bp - B), (0, Cp - C)))

    advp = pad3(adv)
    packed = (cls.astype(jnp.float32) + 4.0 * bcv.astype(jnp.float32)
              + 8.0 * bct.astype(jnp.float32))
    pkp = pad3(packed)
    d4p = pad4(d4)
    op4 = pad4(out_prev4)
    tp4 = pad4(temp4)

    slab = (Ap, S_TILE, Cp) if sweep_axis == 0 else (S_TILE, Bp, Cp)
    n_blocks = (Bp if sweep_axis == 0 else Ap) // S_TILE

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out, tn = pl.pallas_call(
        _make_kernel(n, sweep_axis, exact),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [any_spec] * 5,
        out_specs=(any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct((4, Ap, Bp, Cp), adv.dtype),
                   jax.ShapeDtypeStruct((4, Ap, Bp, Cp), adv.dtype)),
        input_output_aliases={4: 0, 5: 1},   # out_prev->out, temp->temp_new
        scratch_shapes=[
            pltpu.VMEM(slab, adv.dtype),   # adv
            pltpu.VMEM(slab, adv.dtype),   # packed masks
            pltpu.VMEM(slab, adv.dtype),   # d
            pltpu.VMEM(slab, adv.dtype),   # out_prev
            pltpu.VMEM(slab, adv.dtype),   # temp / temp_new
            pltpu.VMEM(slab, adv.dtype),   # d' / x / out_new
            pltpu.VMEM(slab, adv.dtype),   # c'
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=(jax.default_backend() != "tpu"),
    )(scal, advp, pkp, d4p, op4, tp4)

    return out[:, :A, :B, :C], tn[:, :A, :B, :C]
