"""Chunked fused ADI sweep for long lines (any sweep length).

The VMEM-resident kernels (pallas_sweep*.py) need the whole line on chip
and cap out near 256-288 cells.  This kernel processes the sweep in CH-row
chunks: the forward elimination carries (c', d') across chunk boundaries in
registers and stages each chunk's (c', d') rows in HBM scratch; the
backward pass re-streams them in reverse chunk order carrying x.  This is
the TPU equivalent of the reference's global-memory c,d staging — its CUDA
kernel always ran this way (interleaved global arrays,
AdiSolver3D.cu:67-73, 255-306); we only pay it beyond the VMEM cap.

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

from .masks import BC0, BC1, INTERIOR

LANES = 128
S_TILE = 8
# 6 chunk slabs of 8*CH*Cp*4 bytes + carries must sit well inside 16 MB
VMEM_BUDGET = 12 * 2 ** 20


def _pick_chunk(n: int, cp: int) -> int:
    per_row = S_TILE * cp * 4 * 6
    ch = max(8, min(n, VMEM_BUDGET // per_row) // 8 * 8)
    return ch


def _make_kernel(n, n_chunks, ch, sweep_axis, exact, nvars=4, t_var=3,
                 bc2d=False):
    def row(ref, p):
        if sweep_axis == 0:
            return ref[p]
        return ref[:, p, :]

    def set_row(ref, p, val):
        if sweep_axis == 0:
            ref[p] = val
        else:
            ref[:, p, :] = val

    def kernel(scal_ref, adv_hbm, pk_hbm, d_hbm,
               x_hbm, cp_hbm, dp_hbm,
               adv_c, pk_c, d_c, cp_c, dp_c, x_c,
               in_sems, out_sems):
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

            def build(p_global, p_local):
                pk = row(pk_c, p_local)
                bct = jnp.floor(pk * 0.125)
                r = pk - 8.0 * bct
                bcv = jnp.floor(r * 0.25)
                cls = r - 4.0 * bcv
                bc = bct if v == t_var else bcv
                adv = row(adv_c, p_local)
                interior = cls == INTERIOR
                is_bc0 = cls == BC0
                is_bc1 = cls == BC1
                free = bc == 1
                adv_2h = adv * inv2h
                if bc2d:
                    # 2D boundary rows (AdiSolver2D.cpp:74-116): FREE is the
                    # +1/-1 difference stencil, not the 3D (2,-1) rows
                    a = jnp.where(interior, -adv_2h - vis,
                                  jnp.where(is_bc1,
                                            jnp.where(free, 1.0, 0.0), 0.0))
                    b = jnp.where(interior, b_int,
                                  jnp.where(is_bc1,
                                            jnp.where(free, -1.0, 1.0), 1.0))
                    c = jnp.where(interior, adv_2h - vis,
                                  jnp.where(is_bc0,
                                            jnp.where(free, -1.0, 0.0), 0.0))
                else:
                    a = jnp.where(interior, -adv_2h - vis,
                                  jnp.where(is_bc1,
                                            jnp.where(free, -1.0, 0.0), 0.0))
                    b = jnp.where(interior, b_int,
                                  jnp.where(is_bc0 | is_bc1,
                                            jnp.where(free, 2.0, 1.0), 1.0))
                    c = jnp.where(interior, adv_2h - vis,
                                  jnp.where(is_bc0,
                                            jnp.where(free, -1.0, 0.0), 0.0))
                a_eff = jnp.where(p_global == 0, 0.0, a)
                c_eff = jnp.where(p_global == n - 1, 0.0, c)
                return a_eff, b, c_eff, row(d_c, p_local)

            # ---------------------------------------------- forward chunks
            zero = jnp.zeros_like(row(adv_c, 0))
            carry = (zero, zero)
            for k in range(n_chunks):
                a_in = pltpu.make_async_copy(chunk3(adv_hbm, k), adv_c,
                                             in_sems.at[0])
                p_in = pltpu.make_async_copy(chunk3(pk_hbm, k), pk_c,
                                             in_sems.at[1])
                d_in = pltpu.make_async_copy(chunk4(d_hbm, v, k), d_c,
                                             in_sems.at[2])
                a_in.start(); p_in.start(); d_in.start()
                if k > 0:
                    # previous chunk's (c', d') staging still DMA-ing out
                    pltpu.make_async_copy(cp_c, chunk3(cp_hbm, k - 1),
                                          out_sems.at[0]).wait()
                    pltpu.make_async_copy(dp_c, chunk3(dp_hbm, k - 1),
                                          out_sems.at[1]).wait()
                a_in.wait(); p_in.wait(); d_in.wait()

                def fwd_body(i, carry, k=k):
                    c_prev, d_prev = carry
                    a, b, c, d = build(k * ch + i, i)
                    denom = b - a * c_prev
                    if exact:
                        c_new = c / denom
                        d_new = (d - d_prev * a) / denom
                    else:
                        r = pl.reciprocal(denom, approx=False)
                        c_new = c * r
                        d_new = (d - d_prev * a) * r
                    set_row(cp_c, i, c_new)
                    set_row(dp_c, i, d_new)
                    return c_new, d_new

                def fwd_chunk(q, carry, _body=fwd_body):
                    base = q * 8
                    for i in range(8):
                        carry = _body(base + i, carry)
                    return carry

                carry = jax.lax.fori_loop(0, ch // 8, fwd_chunk, carry)
                pltpu.make_async_copy(cp_c, chunk3(cp_hbm, k),
                                      out_sems.at[0]).start()
                pltpu.make_async_copy(dp_c, chunk3(dp_hbm, k),
                                      out_sems.at[1]).start()

            pltpu.make_async_copy(cp_c, chunk3(cp_hbm, n_chunks - 1),
                                  out_sems.at[0]).wait()
            pltpu.make_async_copy(dp_c, chunk3(dp_hbm, n_chunks - 1),
                                  out_sems.at[1]).wait()

            # --------------------------------------------- backward chunks
            x_next = zero
            for kq in range(n_chunks):
                k = n_chunks - 1 - kq
                c_in = pltpu.make_async_copy(chunk3(cp_hbm, k), cp_c,
                                             in_sems.at[0])
                e_in = pltpu.make_async_copy(chunk3(dp_hbm, k), dp_c,
                                             in_sems.at[1])
                c_in.start(); e_in.start()
                if kq > 0:
                    pltpu.make_async_copy(x_c, chunk4(x_hbm, v, k + 1),
                                          out_sems.at[0]).wait()
                c_in.wait(); e_in.wait()

                def bwd_body(q, x_next):
                    i = ch - 1 - q
                    x = row(dp_c, i) - row(cp_c, i) * x_next
                    set_row(x_c, i, x)
                    return x

                def bwd_chunk(qq, x_next):
                    base = qq * 8
                    for i in range(8):
                        x_next = bwd_body(base + i, x_next)
                    return x_next

                x_next = jax.lax.fori_loop(0, ch // 8, bwd_chunk, x_next)
                pltpu.make_async_copy(x_c, chunk4(x_hbm, v, k),
                                      out_sems.at[0]).start()

            pltpu.make_async_copy(x_c, chunk4(x_hbm, v, 0),
                                  out_sems.at[0]).wait()

    return kernel


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


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
    ch = chunk if chunk is not None else _pick_chunk(n0, Cp)
    n = _ceil_to(n0, ch)
    if sweep_axis == 0:
        Ap = n
    else:
        Bp = n
    n_chunks = n // ch

    def pad3(x):
        return jnp.pad(x, ((0, Ap - A), (0, Bp - B), (0, Cp - C)))

    advp = pad3(adv)
    packed = (cls.astype(jnp.float32) + 4.0 * bcv.astype(jnp.float32)
              + 8.0 * bct.astype(jnp.float32))
    pkp = pad3(packed)
    d4p = jnp.pad(d4, ((0, 0), (0, Ap - A), (0, Bp - B), (0, Cp - C)))

    slab = (ch, S_TILE, Cp) if sweep_axis == 0 else (S_TILE, ch, Cp)
    n_blocks = (Bp if sweep_axis == 0 else Ap) // S_TILE

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    x, _, _ = pl.pallas_call(
        _make_kernel(n, n_chunks, ch, sweep_axis, exact, nvars, t_var, bc2d),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct((nvars, Ap, Bp, Cp), adv.dtype),
                   # (c', d') HBM staging, reused across the 4 variables
                   jax.ShapeDtypeStruct((Ap, Bp, Cp), adv.dtype),
                   jax.ShapeDtypeStruct((Ap, Bp, Cp), adv.dtype)),
        scratch_shapes=[
            pltpu.VMEM(slab, adv.dtype),   # adv chunk
            pltpu.VMEM(slab, adv.dtype),   # packed-mask chunk
            pltpu.VMEM(slab, adv.dtype),   # d chunk
            pltpu.VMEM(slab, adv.dtype),   # c' chunk
            pltpu.VMEM(slab, adv.dtype),   # d' chunk
            pltpu.VMEM(slab, adv.dtype),   # x chunk
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=(jax.default_backend() != "tpu"),
    )(scal, advp, pkp, d4p)

    return x[:, :A, :B, :C]
