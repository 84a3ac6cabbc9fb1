"""Pallas TPU kernel: batched Thomas solve.

Layout: the solve runs along the leading axis of (N, S, 128) blocks — sweep
axis on the grid's sequential dimension, batch spread over sublanes (S) and
lanes (128).  Every VPU op processes a full (S_tile, 128) row slab of
independent lines, so the serial Thomas recurrence is vectorized across
1024+ lines at a time.  This is the TPU analogue of the reference's
one-thread-per-segment CUDA kernel with interleaved (element-major) layout
(reference: src/FluidSolver3D/AdiSolver3D.cu:67-73, 376-404) — there the
batch rode consecutive threads; here it rides lanes.

Two passes:
  forward   — eliminates the sub-diagonal, producing (c', d') with the exact
              operation order of the reference Thomas (Algorithms.h:21-38);
              carries (c'_prev, d'_prev) across N-chunks in VMEM scratch
              (Pallas grid steps run sequentially, scratch persists).
  backward  — reversed-grid substitution carrying x_next.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_common import ceil_to as _ceil_to

LANES = 128


def _fwd_kernel(a_ref, b_ref, c_ref, d_ref, cp_ref, dp_ref, carry_c, carry_d,
                *, n_t: int, exact: bool, unroll: bool):
    n_idx = pl.program_id(1)

    def body(p, _):
        ai = a_ref[p]
        bi = b_ref[p]
        ci = c_ref[p]
        di = d_ref[p]
        first = jnp.logical_and(n_idx == 0, p == 0)
        a_eff = jnp.where(first, 0.0, ai)
        # guard the first-row carry reads: interpreter scratch is NaN-filled
        # and NaN * 0 would poison the recurrence
        c_prev = jnp.where(first, 0.0, carry_c[...])
        d_prev = jnp.where(first, 0.0, carry_d[...])
        denom = bi - a_eff * c_prev
        if exact:
            c_new = ci / denom
            d_new = (di - d_prev * a_eff) / denom
        else:
            r = pl.reciprocal(denom, approx=False)
            c_new = ci * r
            d_new = (di - d_prev * a_eff) * r
        cp_ref[p] = c_new
        dp_ref[p] = d_new
        carry_c[...] = c_new
        carry_d[...] = d_new
        return 0

    if unroll:
        for p in range(n_t):   # static row indices: Mosaic schedules flat code
            body(p, 0)
    else:
        jax.lax.fori_loop(0, n_t, body, 0)


def _bwd_kernel(cp_ref, dp_ref, x_ref, carry_x, *, n_t: int, unroll: bool):
    n_idx = pl.program_id(1)

    def body(q, _):
        p = n_t - 1 - q
        ci = cp_ref[p]
        di = dp_ref[p]
        last = jnp.logical_and(n_idx == 0, p == n_t - 1)
        x_next = jnp.where(last, 0.0, carry_x[...])
        c_eff = jnp.where(last, 0.0, ci)
        x = di - c_eff * x_next
        x_ref[p] = x
        carry_x[...] = x
        return 0

    if unroll:
        for q in range(n_t):
            body(q, 0)
    else:
        jax.lax.fori_loop(0, n_t, body, 0)


@functools.partial(jax.jit, static_argnames=("exact", "n_tile", "s_tile",
                                              "unroll"))
def tridiag_pallas(a, b, c, d, exact: bool = True, n_tile: int = 128,
                   s_tile: int = 8, unroll: bool = False):
    """Solve along the LEADING axis. Inputs (N, ...batch) of f32."""
    orig_shape = a.shape
    N = orig_shape[0]
    B = 1
    for s in orig_shape[1:]:
        B *= s

    a2 = a.reshape(N, B)
    b2 = b.reshape(N, B)
    c2 = c.reshape(N, B)
    d2 = d.reshape(N, B)

    c2 = c2.at[-1].set(0.0)  # reference Algorithms.h:23

    Bp = _ceil_to(max(B, 1), s_tile * LANES)
    Np = _ceil_to(N, n_tile)
    if Bp != B or Np != N:
        # padded rows are identity rows (b=1): the carry passes through them
        a2 = jnp.pad(a2, ((0, Np - N), (0, Bp - B)))
        b2 = jnp.pad(b2, ((0, Np - N), (0, Bp - B)), constant_values=1.0)
        c2 = jnp.pad(c2, ((0, Np - N), (0, Bp - B)))
        d2 = jnp.pad(d2, ((0, Np - N), (0, Bp - B)))

    S = Bp // LANES
    shape3 = (Np, S, LANES)
    a3 = a2.reshape(shape3)
    b3 = b2.reshape(shape3)
    c3 = c2.reshape(shape3)
    d3 = d2.reshape(shape3)

    n_chunks = Np // n_tile
    s_chunks = S // s_tile
    blk = (n_tile, s_tile, LANES)

    fwd_spec = pl.BlockSpec(blk, lambda s, n: (n, s, 0), memory_space=pltpu.VMEM)
    cp, dp = pl.pallas_call(
        functools.partial(_fwd_kernel, n_t=n_tile, exact=exact, unroll=unroll),
        grid=(s_chunks, n_chunks),
        in_specs=[fwd_spec] * 4,
        out_specs=(fwd_spec, fwd_spec),
        out_shape=(jax.ShapeDtypeStruct(shape3, a3.dtype),
                   jax.ShapeDtypeStruct(shape3, a3.dtype)),
        scratch_shapes=[pltpu.VMEM((s_tile, LANES), a3.dtype),
                        pltpu.VMEM((s_tile, LANES), a3.dtype)],
    )(a3, b3, c3, d3)

    rev_spec = pl.BlockSpec(blk, lambda s, n: (n_chunks - 1 - n, s, 0),
                            memory_space=pltpu.VMEM)
    x3 = pl.pallas_call(
        functools.partial(_bwd_kernel, n_t=n_tile, unroll=unroll),
        grid=(s_chunks, n_chunks),
        in_specs=[rev_spec, rev_spec],
        out_specs=rev_spec,
        out_shape=jax.ShapeDtypeStruct(shape3, a3.dtype),
        scratch_shapes=[pltpu.VMEM((s_tile, LANES), a3.dtype)],
    )(cp, dp)

    x = x3.reshape(Np, Bp)[:N, :B]
    return x.reshape(orig_shape)
