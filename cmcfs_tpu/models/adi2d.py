"""2D ADI solver — dense masked reformulation of the reference scheme.

Numerics replicate src/FluidSolver2D/AdiSolver2D.cpp:
  * per global iteration: X-direction sweep (RHS from cur, writes half),
    then Y-direction sweep (RHS from half, writes next)  [TimeStep :294-295 —
    listY holds the X-direction row segments],
  * per direction: ``num_local`` inner iterations re-averaging a local
    non-linear layer (SolveDirection :203-226),
  * interior rows a = -q/(2h) - nu/h^2, b = 1/dt + 2 nu/h^2,
    c = q/(2h) - nu/h^2, with RHS cur/dt plus the temperature-gradient
    forcing (U in X pass, V in Y pass) and dissipation heating for T
    (BuildMatrix :118-178),
  * Dirichlet / free boundary rows (ApplyBC0/1 :74-116),
  * global loop runs while (it < num_global) OR (div error > 0.1)
    (TimeStep :291), with the divergence metric of TimeLayer2D.h:88-102.

Instead of per-segment systems we solve one full-width batched tridiagonal
system per direction with identity rows decoupling the segments (see
ops/masks.py) — algebraically identical, and the whole step is one XLA
program (global loop = lax.while_loop).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import NodeType
from ..ops import stencil
from ..ops.masks import BC0, BC1, INTERIOR
from ..ops.tridiag import tridiag_solve
from .common2d import State2D, GridArrays2D, bc_rows_2d, clear_outer

ERR_THRESHOLD = 0.1        # reference AdiSolver2D.h:24
MAX_GLOBAL_ITERS = 100     # reference AdiSolver2D.h:25


class ParamsArgs(NamedTuple):
    v_T: jnp.ndarray
    v_vis: jnp.ndarray
    t_vis: jnp.ndarray
    t_phi: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    start_T: jnp.ndarray


def _build_and_solve(axis: int, cur: State2D, temp_local: State2D,
                     ga: GridArrays2D, dt, pa: ParamsArgs, backend: str,
                     exact: bool) -> State2D:
    """One batched (U,V,T) tridiagonal solve along ``axis``."""
    h = pa.dx if axis == 0 else pa.dy
    cls = ga.cls_x if axis == 0 else ga.cls_y
    adv = temp_local.u if axis == 0 else temp_local.v

    inv_dt = 1.0 / dt
    adv_2h = adv / (2.0 * h)

    v_vis_h2 = pa.v_vis / (h * h)
    t_vis_h2 = pa.t_vis / (h * h)

    if axis == 0:
        grad_T = stencil.d1(temp_local.T, pa.dx, 0)
        diss = stencil.diss_x_2d(temp_local.u, temp_local.v, pa.dx, pa.dy)
    else:
        grad_T = stencil.d1(temp_local.T, pa.dy, 1)
        diss = stencil.diss_y_2d(temp_local.u, temp_local.v, pa.dx, pa.dy)

    interior = cls == INTERIOR
    is_bc0 = cls == BC0
    is_bc1 = cls == BC1

    def assemble(vis_h2, d_int, bc_val):
        a_i = -adv_2h - vis_h2
        b_i = inv_dt + 2.0 * vis_h2
        c_i = adv_2h - vis_h2
        b0, c0, d0, a1, b1, d1 = bc_rows_2d(bc_val, ga.bct)
        a = jnp.where(interior, a_i, jnp.where(is_bc1, a1, 0.0))
        b = jnp.where(interior, b_i, jnp.where(is_bc0, b0, jnp.where(is_bc1, b1, 1.0)))
        c = jnp.where(interior, c_i, jnp.where(is_bc0, c0, 0.0))
        d = jnp.where(interior, d_int, jnp.where(is_bc0, d0, jnp.where(is_bc1, d1, 0.0)))
        return a, b, c, d

    # per-element division matches the reference's f32 rounding
    # (BuildMatrix: cur->U(i+p,j) / dt, AdiSolver2D.cpp:137)
    d_u = cur.u / dt - (pa.v_T * grad_T if axis == 0 else 0.0)
    d_v = cur.v / dt - (pa.v_T * grad_T if axis == 1 else 0.0)
    d_T = cur.T / dt + pa.t_phi * diss

    if backend in ("fused", "fused_dma", "fused_full", "fused_bf16",
                   "fused_nl"):
        # the 3D fused build+solve kernels run the 2D system too (3 vars,
        # "fused_full"/"fused_nl" are accepted as aliases of the manual-DMA
        # path — 2D has no stream kernel, so the 3D default names must not
        # silently fall to the generic rows path here;
        # 2D boundary rows): lines go on the kernel's sweep axis 0, the
        # batch dimension splits into (sublane-tiles, 128 lanes)
        from ..core.types import BCtype
        from ..ops.pallas_sweep_dma import fused_sweep_dma
        from ..ops.pallas_sweep_long import fused_sweep_long
        free = ga.bct == BCtype.FREE
        is_bc = is_bc0 | is_bc1

        def fold(d_int, val):
            d_bc = jnp.where(free, 0.0, val)
            return jnp.where(interior, d_int,
                             jnp.where(is_bc, d_bc, 0.0))

        ds = [fold(d_u, ga.bc_u), fold(d_v, ga.bc_v), fold(d_T, ga.bc_T)]
        scal = jnp.stack([v_vis_h2, t_vis_h2, inv_dt, 1.0 / (2.0 * h)])
        bct_f = ga.bct.astype(jnp.float32)
        arrs = [adv, cls.astype(jnp.float32), bct_f] + ds
        if axis == 1:
            arrs = [jnp.swapaxes(m, 0, 1) for m in arrs]
        n_sweep, batch = arrs[0].shape
        bp = -(-batch // 128) * 128
        arrs = [jnp.pad(m, ((0, 0), (0, bp - batch))).reshape(
                    n_sweep, bp // 128, 128) for m in arrs]
        a3, c3, b3 = arrs[0], arrs[1], arrs[2]
        d3 = jnp.stack(arrs[3:])
        if backend == "fused_bf16":
            # bf16 d/x payload; both kernels keep the Thomas solve f32
            d3 = d3.astype(jnp.bfloat16)
        if n_sweep > 288:
            # chunked long-line kernel (f32 carry staging)
            x3 = fused_sweep_long(a3, c3, b3, b3, d3, scal, sweep_axis=0,
                                  exact=exact, t_var=2, bc2d=True)
        else:
            x3 = fused_sweep_dma(a3, c3, b3, b3, d3, scal, sweep_axis=0,
                                 exact=exact, s_tile=min(8, bp // 128),
                                 t_var=2, bc2d=True)
        x3 = x3.astype(jnp.float32).reshape(3, n_sweep, bp)[:, :, :batch]
        if axis == 1:
            x3 = jnp.swapaxes(x3, 1, 2)
        return State2D(u=x3[0], v=x3[1], T=x3[2])

    rows = [assemble(v_vis_h2, d_u, ga.bc_u),
            assemble(v_vis_h2, d_v, ga.bc_v),
            assemble(t_vis_h2, d_T, ga.bc_T)]
    a = jnp.stack([r[0] for r in rows])
    b = jnp.stack([r[1] for r in rows])
    c = jnp.stack([r[2] for r in rows])
    d = jnp.stack([r[3] for r in rows])

    x = tridiag_solve(a, b, c, d, axis=axis + 1, exact=exact, backend=backend)
    return State2D(u=x[0], v=x[1], T=x[2])


def stream_ok_2d(ga: GridArrays2D) -> tuple:
    """Host-side precondition for the 2D stream-fused path, per axis:
    BC rows must sit on BOUND/VALVE cells (so temp carries the Dirichlet
    values — the UpdateBoundaries invariant) and interior rows must
    coincide with NODE_IN (the in-kernel copy/merge is IN-masked)."""
    import numpy as np
    types = np.asarray(ga.types)
    is_in = types == NodeType.IN
    is_bv = (types == NodeType.BOUND) | (types == NodeType.VALVE)
    oks = []
    for cls in (ga.cls_x, ga.cls_y):
        c = np.asarray(cls)
        bc = (c == BC0) | (c == BC1)
        oks.append(bool(is_bv[bc].all() and ((c == INTERIOR) == is_in).all()))
    return tuple(oks)


def _kernel_layout_2d(axis: int, arrs):
    """(X, Y) field arrays -> kernel layout (n_sweep, b_tiles, 128): lines
    on sweep-axis 0 (the Y direction transposes first), batch padded to the
    lane tile (padded cells are identity rows)."""
    if axis == 1:
        arrs = [jnp.swapaxes(m, 0, 1) for m in arrs]
    n_sweep, batch = arrs[0].shape
    bp = -(-batch // 128) * 128
    return [jnp.pad(m, ((0, 0), (0, bp - batch))).reshape(
                n_sweep, bp // 128, 128) for m in arrs], batch


def _solve_stream_2d(axis: int, rhs: State2D, temp_local: State2D,
                     out: State2D, ga: GridArrays2D, dt, pa: ParamsArgs,
                     exact: bool, first: bool):
    """2D full fusion: in-kernel RHS build + solve + copy-then-merge
    (ops/pallas_sweep_stream.py merge2d mode) — no XLA-side RHS fold or
    merge passes.  Caller guarantees (stream_ok): BC rows sit on
    BOUND/VALVE cells (so temp carries the Dirichlet values — the
    UpdateBoundaries invariant) and interior rows == NODE_IN."""
    from ..ops.pallas_sweep_stream import fused_sweep_stream
    h = pa.dx if axis == 0 else pa.dy
    if axis == 0:
        diss = stencil.diss_x_2d(temp_local.u, temp_local.v, pa.dx, pa.dy)
    else:
        diss = stencil.diss_y_2d(temp_local.u, temp_local.v, pa.dx, pa.dy)
    forcing = pa.t_phi * diss
    scal = jnp.stack([pa.v_vis / (h * h), pa.t_vis / (h * h), 1.0 / dt,
                      1.0 / (2.0 * h), pa.v_T])
    cls = ga.cls_x if axis == 0 else ga.cls_y
    arrs, batch = _kernel_layout_2d(
        axis, [cls, ga.bct] + list(temp_local) + list(rhs) + list(out)
        + [forcing])
    clsr, bctr = arrs[0], arrs[1]
    t3 = jnp.stack(arrs[2:5])
    r3 = jnp.stack(arrs[5:8])
    o3 = jnp.stack(arrs[8:11])
    forcr = arrs[11]
    o4, t4 = fused_sweep_stream(t3, clsr, bctr, bctr, r3, o3, forcr, scal,
                                sweep_axis=0, axis_var=axis, exact=exact,
                                t_var=2, bc2d=True, merge2d=True,
                                first=first)

    def back(m4):
        n_sweep = m4.shape[1]
        m = m4.reshape(3, n_sweep, -1)[:, :, :batch]
        return jnp.swapaxes(m, 1, 2) if axis == 1 else m

    o4, t4 = back(o4), back(t4)
    return (State2D(t4[0], t4[1], t4[2]), State2D(o4[0], o4[1], o4[2]))


def _stream2d_fits(n_sweep: int) -> bool:
    from ..ops.pallas_sweep_stream import stream_vmem_need
    from ..ops.sweep_common import ceil_to
    return stream_vmem_need(ceil_to(n_sweep, 8)) < 100 * 2 ** 20


def _solve_direction(axis: int, rhs: State2D, temp: State2D, out_layer: State2D,
                     ga: GridArrays2D, dt, num_local: int, pa: ParamsArgs,
                     backend: str, exact: bool,
                     stream_ok: tuple = (False, False)):
    """Reference SolveDirection (AdiSolver2D.cpp:203-226)."""
    is_in = ga.types == NodeType.IN

    if (backend in ("fused_full", "fused_nl") and stream_ok[axis]
            and _stream2d_fits(rhs.u.shape[axis])):
        temp_local, out = temp, out_layer
        for it in range(num_local):
            temp_local, out = _solve_stream_2d(axis, rhs, temp_local, out,
                                               ga, dt, pa, exact,
                                               first=(it == 0))
        # temp_local/out only differ from temp/out_layer on IN cells, so
        # the trailing temp_out/next_out masking is already folded in
        return temp_local, out

    def merge(dst: State2D, src: State2D, first: bool) -> State2D:
        if first:
            return State2D(*(jnp.where(is_in, s, d) for d, s in zip(dst, src)))
        return State2D(*(jnp.where(is_in, (d + s) / 2.0, d) for d, s in zip(dst, src)))

    temp_local = temp
    sol = None
    for it in range(num_local):
        sol = _build_and_solve(axis, rhs, temp_local, ga, dt, pa, backend, exact)
        temp_local = merge(temp_local, sol, first=(it == 0))

    temp_out = State2D(*(jnp.where(is_in, tl, t) for t, tl in zip(temp, temp_local)))
    next_out = State2D(*(jnp.where(is_in, s, o) for o, s in zip(out_layer, sol)))
    return temp_out, next_out


@functools.partial(jax.jit, static_argnames=("num_local", "backend", "exact",
                                             "stream_ok"))
def adi_timestep_2d(cur: State2D, ga: GridArrays2D, dt, num_global, num_local: int,
                    pa: ParamsArgs, backend: str = "auto", exact: bool = True,
                    stream_ok: tuple = (False, False)):
    """One reference TimeStep (AdiSolver2D.cpp:279-323).

    Returns (new_cur, err, iters).  The global loop is a lax.while_loop with
    the reference's hybrid condition; the caller checks blow-up host-side
    (reference exit(1) on err > 10*threshold or >100 iterations).
    """
    is_in = ga.types == NodeType.IN
    next0 = cur
    half0 = cur
    temp0 = cur

    err0 = stencil.div_error_2d(cur.u, cur.v, ga.types, pa.dx, pa.dy)

    def cond(carry):
        it, err, _, _, _ = carry
        return ((it < num_global) | (err > ERR_THRESHOLD)) & (it < MAX_GLOBAL_ITERS + 2)

    def body(carry):
        it, err, temp, half, nxt = carry
        temp, half = _solve_direction(0, cur, temp, half, ga, dt, num_local, pa,
                                      backend, exact, stream_ok)
        temp, nxt = _solve_direction(1, half, temp, nxt, ga, dt, num_local, pa,
                                     backend, exact, stream_ok)
        err = stencil.div_error_2d(nxt.u, nxt.v, ga.types, pa.dx, pa.dy)
        # copy on first global iteration, merge-average afterwards (:300-301)
        temp = State2D(*(jnp.where(is_in,
                                   jnp.where(it == 0, n, (t + n) / 2.0),
                                   t) for t, n in zip(temp, nxt)))
        return it + 1, err, temp, half, nxt

    it, err, temp, half, nxt = jax.lax.while_loop(
        cond, body, (jnp.int32(0), err0, temp0, half0, next0))

    nxt = clear_outer(nxt, ga, pa.start_T)
    return nxt, err, it
