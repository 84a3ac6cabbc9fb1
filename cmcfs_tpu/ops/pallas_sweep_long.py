"""Chunked fused ADI sweep for long lines (any sweep length).

The VMEM-resident kernels (pallas_sweep*.py) need the whole line on chip
and cap out near 256-288 cells.  This kernel processes the sweep in CH-row
chunks: the forward elimination carries (c', d') across chunk boundaries
in registers and keeps each chunk's (c', d') rows in an n_res-deep VMEM
ring, staging to HBM scratch ONLY the chunks that overflow the ring; the
backward pass consumes the resident tail directly and re-streams the rest
in reverse chunk order carrying x.  _pick_chunk co-chooses (CH, n_res) so
that common long lines (e.g. 2048 at 128-256 lanes) fit entirely resident
and the 16 B/cell/var staging round-trip vanishes — the round-5 answer to
the measured per-cell cost growth with line length (RESULTS.md r4).  This
is the TPU equivalent of the reference's global-memory c,d staging — its
CUDA kernel always ran this way for EVERY cell (interleaved global
arrays, AdiSolver3D.cu:67-73, 255-306); we only pay it beyond the ring.

Replaces the two-pass fallback (XLA-materialized a,b,c,d row arrays +
ops/pallas_tridiag.py): the coefficient build happens in-kernel from the
advection/mask slabs, cutting per-variable HBM traffic from ~25 to ~8
field-moves, and removing the 4x full-grid row-array allocations that made
384^3 memory-bound (RESULTS.md round-1 known limits).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from .sweep_common import (LANES, S_TILE, build_abc, ceil_to as _ceil_to,
                           decode_pk, make_row_ops, pack_masks)
# chunk slabs of 8*CH*Cp*4 bytes (streams double-buffered, the (c', d')
# carry ring n_res-deep) must sit inside the scoped-VMEM grant
VMEM_BUDGET = 48 * 2 ** 20
VMEM_LIMIT = 64 * 2 ** 20


def _pick_chunk(n: int, cp: int, bf16: bool = False) -> tuple:
    """(rows-per-chunk, resident ring depth) minimizing the (c', d') HBM
    staging within the VMEM budget.

    Round 2 kept the LAST TWO chunks' (c', d') VMEM-resident (they occupy
    the two buffer parities when the forward pass ends); round 5
    generalizes that to an R-deep ring chosen jointly with the chunk
    size: only chunks [0, n_chunks - R) pay the 16 B/cell/var carry
    round-trip.  This is the structural answer to the measured per-cell
    cost growth with line length (2D 2048^2 -15%/cell vs 1024^2,
    RESULTS.md r4; VERDICT r4 weak #4 / next #6): at 2048-long lines the
    whole carry ring fits (R = n_chunks) and staging VANISHES; very long
    lines degrade gradually (staged fraction (m-R)/m) instead of paying
    full staging beyond chunk 2.  The arithmetic per line is a strictly
    sequential Thomas recurrence either way, so (ch, R) choices are
    value-identical — only DMA traffic moves.

    Slab budget per chunk-row (f32-equivalents): streams = adv 2 + pk 2 +
    d 2 + x 2 (f32; bf16: d 1 + x 1 + d_f 2 + x_bf 1) + carry ring 2R.
    CMCFS_LONG_RESIDENT=0 pins the round-2 behavior (ch by the 12/13-slab
    formula, R=2) for silicon A/Bs."""
    u = S_TILE * cp * 4
    fixed = 9 if bf16 else 8
    if os.environ.get("CMCFS_LONG_RESIDENT") == "0":
        per_row = u * (13 if bf16 else 12)
        ch_max = max(8, min(n, VMEM_BUDGET // per_row) // 8 * 8)
        m = -(-n // ch_max)
        return _ceil_to(-(-n // m), 8), 2
    best = None
    for m in range(1, max(2, n // 64) + 1):
        ch = _ceil_to(-(-n // m), 8)
        if ch < 64 and ch < n:
            break                         # seams dominate below 64 rows
        slots = VMEM_BUDGET // (ch * u)
        r = min(m, (slots - fixed) // 2)
        if r < (1 if m == 1 else 2):
            continue                      # ring too shallow to pipeline
        # cost: staged (c', d') round-trip cells + a 32-row-equivalent
        # latency allowance per chunk seam (serial DMA waits on the
        # critical path); favors big chunks unless staging dwarfs seams
        cost = (m - r) * ch + 32 * m
        if best is None or (cost, m) < best[0]:
            best = ((cost, m), (ch, r))
        if r == m:
            break                         # staging gone; more seams only
    if best is None:                      # pathological tiny budget: R=2
        per_row = u * (fixed + 4)
        ch = max(8, min(n, VMEM_BUDGET // per_row) // 8 * 8)
        m = -(-n // ch)
        return _ceil_to(-(-n // m), 8), 2
    return best[1]


def _make_kernel(n, n_chunks, ch, sweep_axis, exact, nvars=4, t_var=3,
                 bc2d=False, bf16=False, n_res=2):
    row, set_row = make_row_ops(sweep_axis)

    def body(scal_ref, adv_hbm, pk_hbm, d_hbm,
             x_hbm, cp_hbm, dp_hbm,
             adv_c, pk_c, d_c, cp_c, dp_c, x_c,
             in_sems, st_sems, x_sems, d_f=None, x_bf=None):
        j = pl.program_id(0)
        v_vis_h2 = scal_ref[0]
        t_vis_h2 = scal_ref[1]
        inv3dt = scal_ref[2]
        inv2h = scal_ref[3]

        def chunk3(ref, k):
            if sweep_axis == 0:
                return ref.at[pl.ds(k * ch, ch), pl.ds(j * S_TILE, S_TILE), :]
            return ref.at[pl.ds(j * S_TILE, S_TILE), pl.ds(k * ch, ch), :]

        def chunk4(ref, vv, k):
            if sweep_axis == 0:
                return ref.at[vv, pl.ds(k * ch, ch),
                              pl.ds(j * S_TILE, S_TILE), :]
            return ref.at[vv, pl.ds(j * S_TILE, S_TILE),
                          pl.ds(k * ch, ch), :]

        for v in range(nvars):
            vis = t_vis_h2 if v == t_var else v_vis_h2
            b_int = inv3dt + 2.0 * vis

            def build(p_global, p_local, kp):
                cls, bcv, bct = decode_pk(row(pk_c.at[kp], p_local))
                bc = bct if v == t_var else bcv
                adv = row(adv_c.at[kp], p_local)
                a, b, c = build_abc(cls, bc == 1, adv * inv2h, vis, b_int,
                                    bc2d)
                a_eff = jnp.where(p_global == 0, 0.0, a)
                c_eff = jnp.where(p_global == n - 1, 0.0, c)
                # bf16 payload: d rows read from the full-chunk f32 upcast
                d_ref = d_f if bf16 else d_c.at[kp]
                return a_eff, b, c_eff, row(d_ref, p_local)

            def start_fwd_in(k):
                kp = k % 2
                pltpu.make_async_copy(chunk3(adv_hbm, k), adv_c.at[kp],
                                      in_sems.at[kp, 0]).start()
                pltpu.make_async_copy(chunk3(pk_hbm, k), pk_c.at[kp],
                                      in_sems.at[kp, 1]).start()
                pltpu.make_async_copy(chunk4(d_hbm, v, k), d_c.at[kp],
                                      in_sems.at[kp, 2]).start()

            def wait_fwd_in(k):
                kp = k % 2
                pltpu.make_async_copy(chunk3(adv_hbm, k), adv_c.at[kp],
                                      in_sems.at[kp, 0]).wait()
                pltpu.make_async_copy(chunk3(pk_hbm, k), pk_c.at[kp],
                                      in_sems.at[kp, 1]).wait()
                pltpu.make_async_copy(chunk4(d_hbm, v, k), d_c.at[kp],
                                      in_sems.at[kp, 2]).wait()

            # ------------------------------- forward chunks (pipelined DMA)
            # chunk k+1's inputs stream in while k eliminates; (c', d')
            # rows live in an n_res-deep VMEM ring — only chunks
            # [0, n_chunks - n_res) stage out to HBM, the LAST n_res
            # chunks occupy the ring when the forward pass ends and stay
            # resident for the backward pass (n_chunks <= n_res therefore
            # stages nothing at all; _pick_chunk co-chooses (ch, n_res)
            # to make that the common case — round 5)
            zero = jnp.zeros_like(row(adv_c.at[0], 0))
            carry = (zero, zero)
            start_fwd_in(0)
            for k in range(n_chunks):
                kin = k % 2
                kr = k % n_res
                if k + 1 < n_chunks:
                    start_fwd_in(k + 1)
                wait_fwd_in(k)
                if bf16:
                    d_f[...] = d_c[kin].astype(jnp.float32)
                if k >= n_res:
                    # ring slot reuse: the out-DMA from k - n_res read it
                    # (the last staged chunk also writes cp/dp, so waits)
                    pltpu.make_async_copy(cp_c.at[kr],
                                          chunk3(cp_hbm, k - n_res),
                                          st_sems.at[kr, 0]).wait()
                    pltpu.make_async_copy(dp_c.at[kr],
                                          chunk3(dp_hbm, k - n_res),
                                          st_sems.at[kr, 1]).wait()

                def fwd_body(i, carry, k=k, kin=kin, kr=kr):
                    c_prev, d_prev = carry
                    a, b, c, d = build(k * ch + i, i, kin)
                    denom = b - a * c_prev
                    if exact:
                        c_new = c / denom
                        d_new = (d - d_prev * a) / denom
                    else:
                        r = pl.reciprocal(denom, approx=False)
                        c_new = c * r
                        d_new = (d - d_prev * a) * r
                    set_row(cp_c.at[kr], i, c_new)
                    set_row(dp_c.at[kr], i, d_new)
                    return c_new, d_new

                def fwd_chunk(q, carry, _body=fwd_body):
                    base = q * 8
                    for i in range(8):
                        carry = _body(base + i, carry)
                    return carry

                carry = jax.lax.fori_loop(0, ch // 8, fwd_chunk, carry)
                if k < n_chunks - n_res:
                    pltpu.make_async_copy(cp_c.at[kr], chunk3(cp_hbm, k),
                                          st_sems.at[kr, 0]).start()
                    pltpu.make_async_copy(dp_c.at[kr], chunk3(dp_hbm, k),
                                          st_sems.at[kr, 1]).start()

            # backward re-streams ride st_sems (idle once the forward
            # drains — every staged chunk's out-DMA was waited at
            # k = staged_k + n_res above) with the same ring slots
            def start_bwd_in(k):
                kr = k % n_res
                pltpu.make_async_copy(chunk3(cp_hbm, k), cp_c.at[kr],
                                      st_sems.at[kr, 0]).start()
                pltpu.make_async_copy(chunk3(dp_hbm, k), dp_c.at[kr],
                                      st_sems.at[kr, 1]).start()

            def wait_bwd_in(k):
                kr = k % n_res
                pltpu.make_async_copy(chunk3(cp_hbm, k), cp_c.at[kr],
                                      st_sems.at[kr, 0]).wait()
                pltpu.make_async_copy(chunk3(dp_hbm, k), dp_c.at[kr],
                                      st_sems.at[kr, 1]).wait()

            # -------------------------------- backward chunks (pipelined)
            # the last n_res chunks are consumed from the resident ring
            # (chunk k sits at slot k % n_res — distinct slots); earlier
            # chunks re-stream from the HBM staging, prefetched n_res
            # iterations ahead (chunk k - n_res's DMA starts after k's
            # solve — its target slot was just freed by that solve)
            x_next = zero
            for kq in range(n_chunks):
                k = n_chunks - 1 - kq
                kx = k % 2
                kr = k % n_res
                if k <= n_chunks - 1 - n_res:
                    wait_bwd_in(k)
                if kq >= 2:
                    # x buffer reuse: the out-DMA from kq-2 used it
                    pltpu.make_async_copy(x_bf.at[kx] if bf16 else x_c.at[kx],
                                          chunk4(x_hbm, v, k + 2),
                                          x_sems.at[kx]).wait()

                def bwd_body(q, x_next, kx=kx, kr=kr):
                    i = ch - 1 - q
                    x = row(dp_c.at[kr], i) - row(cp_c.at[kr], i) * x_next
                    set_row(x_c.at[kx], i, x)
                    return x

                def bwd_chunk(qq, x_next, _body=bwd_body):
                    base = qq * 8
                    for i in range(8):
                        x_next = _body(base + i, x_next)
                    return x_next

                x_next = jax.lax.fori_loop(0, ch // 8, bwd_chunk, x_next)
                if bf16:
                    x_bf[kx] = x_c[kx].astype(jnp.bfloat16)
                pltpu.make_async_copy(x_bf.at[kx] if bf16 else x_c.at[kx],
                                      chunk4(x_hbm, v, k),
                                      x_sems.at[kx]).start()
                if 0 <= k - n_res <= n_chunks - 1 - n_res:
                    start_bwd_in(k - n_res)

            for k in range(min(2, n_chunks)):
                pltpu.make_async_copy(x_bf.at[k % 2] if bf16 else x_c.at[k % 2],
                                      chunk4(x_hbm, v, k),
                                      x_sems.at[k % 2]).wait()

    if bf16:
        def kernel(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm, cp_hbm, dp_hbm,
                   adv_c, pk_c, d_c, cp_c, dp_c, x_c, d_f, x_bf,
                   in_sems, st_sems, x_sems):
            body(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm, cp_hbm, dp_hbm,
                 adv_c, pk_c, d_c, cp_c, dp_c, x_c,
                 in_sems, st_sems, x_sems, d_f=d_f, x_bf=x_bf)
    else:
        def kernel(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm, cp_hbm, dp_hbm,
                   adv_c, pk_c, d_c, cp_c, dp_c, x_c,
                   in_sems, st_sems, x_sems):
            body(scal_ref, adv_hbm, pk_hbm, d_hbm, x_hbm, cp_hbm, dp_hbm,
                 adv_c, pk_c, d_c, cp_c, dp_c, x_c,
                 in_sems, st_sems, x_sems)
    return kernel


@functools.partial(jax.jit, static_argnames=("sweep_axis", "exact", "chunk",
                                             "t_var", "bc2d"))
def fused_sweep_long(adv, cls, bcv, bct, d4, scal, sweep_axis: int,
                     exact: bool = True, chunk: int | None = None,
                     t_var: int | None = None, bc2d: bool = False):
    """Drop-in equivalent of fused_sweep for arbitrary sweep lengths.

    Variable count follows d4.shape[0]; ``t_var``/``bc2d`` as in
    fused_sweep_dma (2D solver support)."""
    nvars = d4.shape[0]
    if t_var is None:
        t_var = nvars - 1
    A, B, C = adv.shape
    Cp = _ceil_to(C, LANES)
    Ap = _ceil_to(A, S_TILE)
    Bp = _ceil_to(B, S_TILE)
    n0 = (Ap, Bp)[sweep_axis]
    # the row loops advance in 8-row groups; a non-multiple chunk would
    # silently skip rows, so round a caller-supplied chunk up
    bf16_mode = d4.dtype == jnp.bfloat16
    if chunk is not None:
        ch = _ceil_to(chunk, 8)
        u = S_TILE * Cp * 4
        # clamp a caller-supplied chunk so the fixed streams + a minimal
        # 2-deep (c', d') ring stay inside the scoped-VMEM budget (a
        # too-big request otherwise OOMs at Mosaic compile time: the
        # fixed slab count alone is 8-9 chunk-rows)
        fixed = 9 if bf16_mode else 8
        cap = max(8, (VMEM_BUDGET // (u * (fixed + 2))) // 8 * 8)
        ch = min(ch, cap)
        m = -(-n0 // ch)
        slots = VMEM_BUDGET // (ch * u)
        n_res = min(m, max(1 if m == 1 else 2,
                           (slots - fixed) // 2))
    else:
        ch, n_res = _pick_chunk(n0, Cp, bf16=bf16_mode)
    n = _ceil_to(n0, ch)
    if sweep_axis == 0:
        Ap = n
    else:
        Bp = n
    n_chunks = n // ch

    def pad3(x):
        return jnp.pad(x, ((0, Ap - A), (0, Bp - B), (0, Cp - C)))

    advp = pad3(adv)
    pkp = pad3(pack_masks(cls, bcv, bct))
    d4p = jnp.pad(d4, ((0, 0), (0, Ap - A), (0, Bp - B), (0, Cp - C)))

    slab = (ch, S_TILE, Cp) if sweep_axis == 0 else (S_TILE, ch, Cp)
    n_blocks = (Bp if sweep_axis == 0 else Ap) // S_TILE

    # bf16 payload storage follows the d4 dtype (d in / x out); the adv and
    # packed-mask chunks, the Thomas recurrence, and the (c', d') carry
    # ring all stay f32
    bf16 = d4.dtype == jnp.bfloat16
    f32 = jnp.float32
    pay_scratch = [pltpu.VMEM((2,) + slab, d4.dtype),     # d chunks
                   pltpu.VMEM((n_res,) + slab, f32),      # c' ring
                   pltpu.VMEM((n_res,) + slab, f32),      # d' ring
                   pltpu.VMEM((2,) + slab, f32)]          # x work chunks
    if bf16:
        pay_scratch += [pltpu.VMEM(slab, f32),          # d_f upcast stage
                        pltpu.VMEM((2,) + slab, d4.dtype)]  # x_bf DMA bufs

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    x, _, _ = pl.pallas_call(
        _make_kernel(n, n_chunks, ch, sweep_axis, exact, nvars, t_var, bc2d,
                     bf16, n_res),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct((nvars, Ap, Bp, Cp), d4.dtype),
                   # (c', d') HBM staging, reused across the 4 variables
                   jax.ShapeDtypeStruct((Ap, Bp, Cp), f32),
                   jax.ShapeDtypeStruct((Ap, Bp, Cp), f32)),
        scratch_shapes=[
            pltpu.VMEM((2,) + slab, f32),         # adv chunks (pipelined)
            pltpu.VMEM((2,) + slab, f32),         # packed-mask chunks
        ] + pay_scratch + [
            pltpu.SemaphoreType.DMA((2, 3)),      # in_sems [parity, a|p|d]
            pltpu.SemaphoreType.DMA((n_res, 2)),  # st_sems [slot, c'|d']
            pltpu.SemaphoreType.DMA((2,)),        # x_sems [parity]
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
        interpret=(jax.default_backend() != "tpu"),
    )(scal, advp, pkp, d4p)

    return x[:, :A, :B, :C]
