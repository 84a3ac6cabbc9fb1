"""Streamed full-fusion ADI sweep: RHS build + Thomas + update + merge.

The fused_dma kernel (pallas_sweep_dma.py) still pays
for a materialized RHS array (XLA writes d4 = 4 fields, kernel reads it
back) and for XLA merge passes (UpdateSegment + NODE_IN averaging: ~20
field-moves per direction iteration).  This kernel moves both inside:

* the RHS is built in-kernel from the raw ``rhs`` fields: interior rows
  d = rhs*3/dt (+ the -v_T*dT/dh forcing for the sweep-direction velocity,
  with grad_T computed from the resident temp-T slab; + the precomputed
  t_phi*diss forcing for T), boundary rows d = bc value — read from the
  variable's own *temp* slab: temp[BOUND/VALVE] == grid bc value is a step
  invariant (UpdateBoundaries seeds it, merges touch only NODE_IN cells),
  so no separate val arrays travel at all;
* the backward pass fuses the reference's UpdateSegment + MergeLayerTo
  (AdiSolver3D.cpp:707-730, 664-683):
      out_new  = where(row written, x, out_prev)
      temp_new = where(NODE_IN, (temp + out_new)/2, temp)
* all DMAs are streamed one variable ahead (input slabs double-buffered,
  outputs double-buffered), so on this DMA-latency-bound chip the copies
  aggregate across concurrent streams instead of serializing — the failure
  mode that made the round-1 fused_merge variant lose;
* the pipeline also crosses grid blocks (linearized (j, cidx) order): the
  next block's shared slabs and first two variables' inputs prefetch during
  this block's solves, and the final output DMAs drain during the next
  block — only the first input and last output DMA of the whole invocation
  are exposed;
* optional bf16 payload storage (rhs/out_prev in, out/temp_new out follow
  the rhs dtype): halves those slabs' HBM bytes; the Thomas recurrence,
  the merge, and the temp/BC values stay f32.

Per direction-iteration HBM traffic: ~11 field reads + 8 field writes,
vs ~30 reads + 16 writes for the fused_dma + XLA-merge pipeline.

This is the TPU descendant of the reference's fused matrix-build + Thomas
CUDA kernel with INTERNAL_MERGE_ENABLE (AdiSolver3D.cu:75-374): there the
fusion saved kernel launches and global-memory round-trips of (a,b,c,d);
here it saves the HBM round-trips of d4 and the merge fields.

Caller guarantees: no dual endpoints, interior rows == NODE_IN for this
axis, sweep length within the VMEM cap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masks import BC0, BC1, INTERIOR
from .sweep_common import (LANES, S_TILE, build_a, build_abc,
                           ceil_to as _ceil_to, decode_pk, make_row_ops,
                           pack_masks)
# slab set + merge temporaries must fit the scoped-VMEM grant; enforced by
# callers via this constant (models/adi3d.py ok_size) and asserted below
MAX_SWEEP = 256


def _make_kernel(n, sweep_axis, axis_var, exact, c_blocks, bf16=False,
                 nvars=4, t_var=3, bc2d=False, merge2d=False, first=False):
    row, set_row = make_row_ops(sweep_axis)

    # streamed-input layout: in_buf[slot, 0]=rhs_v, [slot, 1]=out_prev_v,
    # [slot, 2]=temp_v (vars other than axis_var/T) or t_phi*diss (v==3)
    # op_hbm is aliased to out_hbm (input_output_aliases): the solve updates
    # the direction's output layer in place, so unwritten slabs keep their
    # previous values and written ones are read (as out_prev) strictly
    # before they are overwritten within each block
    def body(scal_ref, temp_hbm, pk_hbm, rhs_hbm, op_hbm, forc_hbm,
             out_hbm, tn_hbm,
             adv_v, T_v, pk_v, in_buf, out_buf, tn_buf, cp, rbuf,
             sh_sems, in_sems, out_sems,
             in_pay=None, in_aux=None, out_bf=None, tn_bf=None, rhs_f=None):
        j = pl.program_id(0)
        cidx = pl.program_id(1)
        # cross-block software pipeline over the linearized (j, cidx) grid:
        # the next block's shared slabs (block-parity double-buffered) and
        # first two variables' inputs stream during this block's solves; the
        # final output DMAs drain during the next block
        L = j * c_blocks + cidx
        total = pl.num_programs(0) * pl.num_programs(1)
        bp = jax.lax.rem(L, 2)
        nj = jax.lax.div(L + 1, c_blocks)
        nc = jax.lax.rem(L + 1, c_blocks)
        v_vis_h2 = scal_ref[0]
        t_vis_h2 = scal_ref[1]
        inv3dt = scal_ref[2]
        inv2h = scal_ref[3]
        v_T = scal_ref[4]

        # payload refs: in bf16 storage mode rhs/op land in bf16 buffers
        # (rhs staged through a full-slab f32 upcast for row access) and
        # out/temp_new leave through bf16 downcast buffers; the aux channel
        # (temp_v / forcing) and all compute stay f32
        def rhs_dma_ref(slot):
            return in_pay.at[slot, 0] if bf16 else in_buf.at[slot, 0]

        def op_dma_ref(slot):
            return in_pay.at[slot, 1] if bf16 else in_buf.at[slot, 1]

        def aux_dma_ref(slot):
            return in_aux.at[slot] if bf16 else in_buf.at[slot, 2]

        def out_dma_ref(slot):
            return out_bf.at[slot] if bf16 else out_buf.at[slot]

        def tn_dma_ref(slot):
            return tn_bf.at[slot] if bf16 else tn_buf.at[slot]

        def slab3(ref, jj=None, cc=None):
            jj = j if jj is None else jj
            cc = cidx if cc is None else cc
            if sweep_axis == 0:
                return ref.at[:, pl.ds(jj * S_TILE, S_TILE),
                              pl.ds(cc * LANES, LANES)]
            return ref.at[pl.ds(jj * S_TILE, S_TILE), :,
                          pl.ds(cc * LANES, LANES)]

        def slab4(ref, vv, jj=None, cc=None):
            jj = j if jj is None else jj
            cc = cidx if cc is None else cc
            if sweep_axis == 0:
                return ref.at[vv, :, pl.ds(jj * S_TILE, S_TILE),
                              pl.ds(cc * LANES, LANES)]
            return ref.at[vv, pl.ds(jj * S_TILE, S_TILE), :,
                          pl.ds(cc * LANES, LANES)]

        def start_inputs(v, slot, jj=None, cc=None):
            pltpu.make_async_copy(slab4(rhs_hbm, v, jj, cc),
                                  rhs_dma_ref(slot),
                                  in_sems.at[slot, 0]).start()
            pltpu.make_async_copy(slab4(op_hbm, v, jj, cc),
                                  op_dma_ref(slot),
                                  in_sems.at[slot, 1]).start()
            if v == t_var:
                pltpu.make_async_copy(slab3(forc_hbm, jj, cc),
                                      aux_dma_ref(slot),
                                      in_sems.at[slot, 2]).start()
            elif v != axis_var:
                pltpu.make_async_copy(slab4(temp_hbm, v, jj, cc),
                                      aux_dma_ref(slot),
                                      in_sems.at[slot, 2]).start()

        def wait_inputs(v, slot):
            pltpu.make_async_copy(slab4(rhs_hbm, v), rhs_dma_ref(slot),
                                  in_sems.at[slot, 0]).wait()
            pltpu.make_async_copy(slab4(op_hbm, v), op_dma_ref(slot),
                                  in_sems.at[slot, 1]).wait()
            if v != axis_var:
                src = (slab3(forc_hbm) if v == t_var
                       else slab4(temp_hbm, v))
                pltpu.make_async_copy(src, aux_dma_ref(slot),
                                      in_sems.at[slot, 2]).wait()

        def start_shared(par, jj, cc):
            pltpu.make_async_copy(slab4(temp_hbm, axis_var, jj, cc),
                                  adv_v.at[par], sh_sems.at[par, 0]).start()
            pltpu.make_async_copy(slab4(temp_hbm, t_var, jj, cc),
                                  T_v.at[par], sh_sems.at[par, 1]).start()
            pltpu.make_async_copy(slab3(pk_hbm, jj, cc),
                                  pk_v.at[par], sh_sems.at[par, 2]).start()

        @pl.when(L == 0)
        def _():
            start_shared(bp, j, cidx)
            start_inputs(0, 0)
            start_inputs(1, 1)

        @pl.when(L + 1 < total)
        def _():
            start_shared(1 - bp, nj, nc)

        pltpu.make_async_copy(slab4(temp_hbm, axis_var), adv_v.at[bp],
                              sh_sems.at[bp, 0]).wait()
        pltpu.make_async_copy(slab4(temp_hbm, t_var), T_v.at[bp],
                              sh_sems.at[bp, 1]).wait()
        pltpu.make_async_copy(slab3(pk_hbm), pk_v.at[bp],
                              sh_sems.at[bp, 2]).wait()
        adv_b = adv_v.at[bp]
        T_b = T_v.at[bp]
        pk_b = pk_v.at[bp]

        zero = jnp.zeros_like(row(adv_b, 0))

        def chunked(body, init):
            # manual 8-row unroll: per-row work that is off the carry chain
            # gets interleaved by Mosaic with the latency-bound recurrence
            def chunk(k, carry):
                base = k * 8
                for i in range(8):
                    carry = body(base + i, carry)
                return carry
            return jax.lax.fori_loop(0, n // 8, chunk, init)

        def decode(p):
            return decode_pk(row(pk_b, p))

        def a_eff_row(p, cls, free, vis):
            a = build_a(cls, free, row(adv_b, p) * inv2h, vis, bc2d=bc2d)
            return jnp.where(p == 0, 0.0, a)

        def coeff_pass(vis, for_T):
            """Shared elimination-coefficient chain: u, v, w have identical
            (a, b, c) rows (same viscosity, same advection field, same BC
            structure — only d differs), so c' and denom are computed ONCE
            for the velocity group and reused bit-exactly; the reference
            recomputes the identical stream per variable
            (BuildMatrix, AdiSolver3D.cpp:732-802)."""
            b_int = inv3dt + 2.0 * vis

            def body(p, c_prev):
                cls, bcv, bct = decode(p)
                free = (bct if for_T else bcv) == 1
                a, b, c = build_abc(cls, free, row(adv_b, p) * inv2h, vis,
                                    b_int, bc2d=bc2d)
                a_eff = jnp.where(p == 0, 0.0, a)
                c_eff = jnp.where(p == n - 1, 0.0, c)
                denom = b - a_eff * c_prev
                if exact:
                    c_new = c_eff / denom
                    set_row(rbuf, p, denom)
                else:
                    r = pl.reciprocal(denom, approx=False)
                    c_new = c_eff * r
                    set_row(rbuf, p, r)
                set_row(cp, p, c_new)
                return c_new

            chunked(body, zero)

        def solve_var(v, slot, vis):
            """d-elimination + back substitution + fused update/merge for
            one variable, using the group's precomputed (c', denom)."""
            tv_ref = (adv_b if v == axis_var
                      else (T_b if v == t_var else aux_dma_ref(slot)))
            rhs_ref = rhs_f if bf16 else in_buf.at[slot, 0]

            def d_body(p, d_prev):
                cls, bcv, bct = decode(p)
                free = (bct if v == t_var else bcv) == 1
                interior = cls == INTERIOR
                a_eff = a_eff_row(p, cls, free, vis)
                # in-kernel RHS (reference BuildMatrix AdiSolver3D.cpp:732-802)
                d_int = row(rhs_ref, p) * inv3dt
                if v == axis_var:
                    pp = jnp.minimum(p + 1, n - 1)
                    pm = jnp.maximum(p - 1, 0)
                    grad = (row(T_b, pp) - row(T_b, pm)) * inv2h
                    d_int = d_int - v_T * grad
                elif v == t_var:
                    d_int = d_int + row(aux_dma_ref(slot), p)
                d_bc = jnp.where(free, 0.0, row(tv_ref, p))
                d = jnp.where(interior, d_int,
                              jnp.where((cls == BC0) | (cls == BC1), d_bc, 0.0))
                rr = row(rbuf, p)
                num = d - d_prev * a_eff
                d_new = num / rr if exact else num * rr
                set_row(out_buf.at[slot], p, d_new)  # stage d' in out buffer
                return d_new

            chunked(d_body, zero)

            def bwd_body(q, x_next):
                p = n - 1 - q
                x = row(out_buf.at[slot], p) - row(cp, p) * x_next
                set_row(tn_buf.at[slot], p, x)   # stage raw x
                return x

            chunked(bwd_body, zero)

            # vectorized UpdateSegment + merge (the per-row loops above
            # carry only the recurrences), in static row chunks to bound
            # the temporaries' VMEM stack footprint
            n_mrg = 4
            for m in range(n_mrg):
                sl = ((slice(m * n // n_mrg, (m + 1) * n // n_mrg),)
                      if sweep_axis == 0 else
                      (slice(None), slice(m * n // n_mrg, (m + 1) * n // n_mrg)))
                cls, _, _ = decode_pk(pk_b[sl])
                is_in = cls == INTERIOR     # caller guarantees == NODE_IN
                t_old = tv_ref[sl]
                x_new = tn_buf[(slot,) + sl]
                op_prev = (in_pay[(slot, 1) + sl].astype(jnp.float32)
                           if bf16 else in_buf[(slot, 1) + sl])
                if merge2d:
                    # 2D copy-then-merge (AdiSolver2D.cpp:203-226): the
                    # first local iteration COPIES sol into temp_local on
                    # IN cells, later ones average; writes are IN-masked
                    out_new = jnp.where(is_in, x_new, op_prev)
                    t_new = jnp.where(is_in,
                                      x_new if first
                                      else (t_old + x_new) / 2.0, t_old)
                else:
                    # 3D UpdateSegment writes BC endpoints too
                    # (AdiSolver3D.cpp:707-730); merge averages on IN
                    written = cls != 0.0
                    out_new = jnp.where(written, x_new, op_prev)
                    t_new = jnp.where(is_in, (t_old + out_new) * 0.5, t_old)
                out_buf[(slot,) + sl] = out_new
                tn_buf[(slot,) + sl] = t_new

        coeff_pass(v_vis_h2, for_T=False)       # shared by the velocities
        for v in range(nvars):
            slot = v % 2
            wait_inputs(v, slot)
            if bf16:
                rhs_f[...] = in_pay[slot, 0].astype(jnp.float32)
            if v >= 2:
                # out/tn buffers for this slot were DMA-ing since var v-2
                pltpu.make_async_copy(out_dma_ref(slot),
                                      slab4(out_hbm, v - 2),
                                      out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(tn_dma_ref(slot),
                                      slab4(tn_hbm, v - 2),
                                      out_sems.at[slot, 1]).wait()
            else:
                # the buffers' last out-DMAs belong to the previous block's
                # var v+2 (same byte count — the wait only services the sem)
                @pl.when(L > 0)
                def _():
                    pltpu.make_async_copy(out_dma_ref(slot),
                                          slab4(out_hbm, v),
                                          out_sems.at[slot, 0]).wait()
                    pltpu.make_async_copy(tn_dma_ref(slot),
                                          slab4(tn_hbm, v),
                                          out_sems.at[slot, 1]).wait()
            if v == t_var:
                coeff_pass(t_vis_h2, for_T=True)    # overwrites cp/rbuf
            solve_var(v, slot, t_vis_h2 if v == t_var else v_vis_h2)
            if bf16:
                out_bf[slot] = out_buf[slot].astype(jnp.bfloat16)
                tn_bf[slot] = tn_buf[slot].astype(jnp.bfloat16)

            pltpu.make_async_copy(out_dma_ref(slot), slab4(out_hbm, v),
                                  out_sems.at[slot, 0]).start()
            pltpu.make_async_copy(tn_dma_ref(slot), slab4(tn_hbm, v),
                                  out_sems.at[slot, 1]).start()
            if v + 2 < nvars:
                # refill this slot's inputs for var v+2 while v+1 computes
                start_inputs(v + 2, slot)
            else:
                # v's solve no longer reads in_buf[slot]: prefetch the next
                # block's inputs behind the remaining work.  The next-block
                # var whose turn this slot serves is the slot index itself
                # (v=0 -> slot 0, v=1 -> slot 1) — correct for even AND odd
                # nvars (odd nvars stagger the in-block v%2 parity, but the
                # last user of slot s in a block is always followed by
                # next-block var s)
                @pl.when(L + 1 < total)
                def _():
                    start_inputs(slot, slot, nj, nc)

        @pl.when(L == total - 1)
        def _():
            for v in range(max(0, nvars - 2), nvars):
                slot = v % 2
                pltpu.make_async_copy(out_dma_ref(slot), slab4(out_hbm, v),
                                      out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(tn_dma_ref(slot), slab4(tn_hbm, v),
                                      out_sems.at[slot, 1]).wait()

    if bf16:
        def kernel(scal_ref, temp_hbm, pk_hbm, rhs_hbm, op_hbm, forc_hbm,
                   out_hbm, tn_hbm,
                   adv_v, T_v, pk_v, in_pay, in_aux, out_buf, tn_buf,
                   out_bf, tn_bf, rhs_f, cp, rbuf,
                   sh_sems, in_sems, out_sems):
            body(scal_ref, temp_hbm, pk_hbm, rhs_hbm, op_hbm, forc_hbm,
                 out_hbm, tn_hbm,
                 adv_v, T_v, pk_v, None, out_buf, tn_buf, cp, rbuf,
                 sh_sems, in_sems, out_sems,
                 in_pay=in_pay, in_aux=in_aux, out_bf=out_bf, tn_bf=tn_bf,
                 rhs_f=rhs_f)
    else:
        def kernel(scal_ref, temp_hbm, pk_hbm, rhs_hbm, op_hbm, forc_hbm,
                   out_hbm, tn_hbm,
                   adv_v, T_v, pk_v, in_buf, out_buf, tn_buf, cp, rbuf,
                   sh_sems, in_sems, out_sems):
            body(scal_ref, temp_hbm, pk_hbm, rhs_hbm, op_hbm, forc_hbm,
                 out_hbm, tn_hbm,
                 adv_v, T_v, pk_v, in_buf, out_buf, tn_buf, cp, rbuf,
                 sh_sems, in_sems, out_sems)
    return kernel


def stream_vmem_need(n: int, bf16: bool = False) -> int:
    """Scoped-VMEM bytes the kernel's scratch set needs at sweep length n
    (slab thickness S_TILE, LANES lanes).  Callers beyond MAX_SWEEP (the
    2D long-line case) must keep this under ~100MB."""
    slab_bytes = n * S_TILE * LANES * 4
    slabs = (6 + 13) if bf16 else (6 + 10 + 2)   # shared + payload + cp/rbuf
    return slabs * slab_bytes


@functools.partial(jax.jit,
                   static_argnames=("sweep_axis", "axis_var", "exact",
                                    "t_var", "bc2d", "merge2d", "first"))
def fused_sweep_stream(temp4, cls, bcv, bct, rhs4, out_prev4, forcing, scal,
                       sweep_axis: int, axis_var: int, exact: bool = True,
                       t_var: int | None = None, bc2d: bool = False,
                       merge2d: bool = False, first: bool = False):
    """Returns (out_new4, temp_new4) for one direction-local-iteration.

    temp4/rhs4/out_prev4: (nvars, A, B, C) stacked fields (3D: u,v,w,T;
    2D: u,v,T); forcing: (A, B, C) = t_phi*diss for the T equation; scal:
    (5,) f32 = [v_vis_h2, t_vis_h2, 3/dt (2D: 1/dt), 1/(2h), v_T].
    ``axis_var`` is the physical sweep direction (picks the advection/temp
    component and the grad-T forcing); ``sweep_axis`` in {0, 1} is the
    slab geometry — callers handle Z by swapping axes 1<->2 (Z_as_Y,
    AdiSolver3D.cu:198-210).

    2D mode (AdiSolver2D semantics): ``t_var``/``bc2d`` as in
    fused_sweep_dma, ``merge2d`` selects the copy-then-merge fold
    (IN-masked writes; ``first`` = copy instead of average —
    AdiSolver2D.cpp:203-226).
    """
    nvars, A, B, C = temp4.shape
    if t_var is None:
        t_var = nvars - 1
    Cp = _ceil_to(C, LANES)
    Ap = _ceil_to(A, S_TILE)
    Bp = _ceil_to(B, S_TILE)
    n = (Ap, Bp)[sweep_axis]
    # 3D callers gate on MAX_SWEEP; the 2D single-block case may go longer
    # as long as the scratch set fits the scoped-VMEM grant
    vmem_need = stream_vmem_need(n, rhs4.dtype == jnp.bfloat16)
    assert vmem_need < 100 * 2 ** 20, (n, vmem_need)

    def pad3(x):
        return jnp.pad(x, ((0, Ap - A), (0, Bp - B), (0, Cp - C)))

    def pad4(x):
        return jnp.pad(x, ((0, 0), (0, Ap - A), (0, Bp - B), (0, Cp - C)))

    tp4 = pad4(temp4)
    pkp = pad3(pack_masks(cls, bcv, bct))
    rp4 = pad4(rhs4)
    op4 = pad4(out_prev4)
    fp = pad3(forcing)

    slab = (Ap, S_TILE, LANES) if sweep_axis == 0 else (S_TILE, Bp, LANES)
    n_blocks = (Bp if sweep_axis == 0 else Ap) // S_TILE
    c_blocks = Cp // LANES

    # bf16 storage mode follows the rhs/out_prev payload dtype (temp4 and
    # forcing stay f32: temp carries the exact BC values and the shared
    # slabs; all compute is f32 regardless)
    bf16 = rp4.dtype == jnp.bfloat16
    f32 = jnp.float32
    if bf16:
        pay_scratch = [
            pltpu.VMEM((2, 2) + slab, jnp.bfloat16),  # in_pay rhs|op
            pltpu.VMEM((2,) + slab, f32),             # in_aux temp_v/forc
            pltpu.VMEM((2,) + slab, f32),             # out work (f32)
            pltpu.VMEM((2,) + slab, f32),             # temp_new work (f32)
            pltpu.VMEM((2,) + slab, jnp.bfloat16),    # out_bf DMA buffer
            pltpu.VMEM((2,) + slab, jnp.bfloat16),    # tn_bf DMA buffer
            pltpu.VMEM(slab, f32),                    # rhs_f upcast stage
        ]
    else:
        pay_scratch = [
            pltpu.VMEM((2, 3) + slab, f32),           # streamed inputs
            pltpu.VMEM((2,) + slab, f32),             # out double buffer
            pltpu.VMEM((2,) + slab, f32),             # temp_new double buffer
        ]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out, tn = pl.pallas_call(
        _make_kernel(n, sweep_axis, axis_var, exact, c_blocks, bf16,
                     nvars=nvars, t_var=t_var, bc2d=bc2d, merge2d=merge2d,
                     first=first),
        grid=(n_blocks, c_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [any_spec] * 5,
        out_specs=(any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct((nvars, Ap, Bp, Cp), rp4.dtype),
                   jax.ShapeDtypeStruct((nvars, Ap, Bp, Cp), rp4.dtype)),
        input_output_aliases={4: 0},    # out_prev buffer IS the output layer
        scratch_shapes=[
            pltpu.VMEM((2,) + slab, f32),           # adv (block-parity 2x)
            pltpu.VMEM((2,) + slab, f32),           # T   (block-parity 2x)
            pltpu.VMEM((2,) + slab, f32),           # packed masks (2x)
        ] + pay_scratch + [
            pltpu.VMEM(slab, f32),                  # c' line
            pltpu.VMEM(slab, f32),                  # denom / 1/denom line
            pltpu.SemaphoreType.DMA((2, 3)),        # sh_sems [parity, a|T|p]
            pltpu.SemaphoreType.DMA((2, 3)),        # in_sems
            pltpu.SemaphoreType.DMA((2, 2)),        # out_sems
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=max(32 * 2 ** 20, int(vmem_need * 1.3))),
        interpret=(jax.default_backend() != "tpu"),
    )(scal, tp4, pkp, rp4, op4, fp)

    return out[:, :A, :B, :C], tn[:, :A, :B, :C]
