"""2D explicit Euler solver (reference: src/FluidSolver2D/ExplicitSolver2D.cpp).

Per global iteration: explicit update of u, v, T on NODE_IN cells with
advection, temperature-gradient forcing, viscosity and dissipation heating
(SolveU/V/T :54-109); then temp <- average(temp, next) on IN cells; loop
while (it < num_global) OR (div error > 0.1).  The reference's ``num_local``
inner loop recomputes an identical update (temp is not refreshed between
inner iterations), so a single evaluation is exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.types import NodeType
from ..ops import stencil
from .adi2d import ParamsArgs
from .common2d import State2D, GridArrays2D, clear_outer

ERR_THRESHOLD = 0.1        # reference ExplicitSolver2D.h:21
MAX_GLOBAL_ITERS = 100


def _explicit_update(cur: State2D, temp: State2D, pa: ParamsArgs, dt):
    dx, dy = pa.dx, pa.dy
    u, v, T = temp
    ux = stencil.d1(u, dx, 0); uy = stencil.d1(u, dy, 1)
    vx = stencil.d1(v, dx, 0); vy = stencil.d1(v, dy, 1)
    tx = stencil.d1(T, dx, 0); ty = stencil.d1(T, dy, 1)
    uxx = stencil.d2(u, dx, 0); uyy = stencil.d2(u, dy, 1)
    vxx = stencil.d2(v, dx, 0); vyy = stencil.d2(v, dy, 1)
    txx = stencil.d2(T, dx, 0); tyy = stencil.d2(T, dy, 1)
    diss = (stencil.diss_x_2d(u, v, dx, dy) + stencil.diss_y_2d(u, v, dx, dy))

    nu = cur.u + dt * (-u * ux - v * uy - pa.v_T * tx + pa.v_vis * (uxx + uyy))
    nv = cur.v + dt * (-u * vx - v * vy - pa.v_T * ty + pa.v_vis * (vxx + vyy))
    nT = cur.T + dt * (-u * tx - v * ty + pa.t_vis * (txx + tyy) + pa.t_phi * diss)
    return State2D(nu, nv, nT)


@functools.partial(jax.jit, static_argnames=("num_local",))
def explicit_timestep_2d(cur: State2D, nxt0: State2D, ga: GridArrays2D, dt,
                         num_global, num_local: int, pa: ParamsArgs):
    """One reference TimeStep (ExplicitSolver2D.cpp:111-151).

    ``nxt0`` is the persistent next layer (the explicit scheme never copies
    cur into next wholesale; only IN cells are overwritten).
    """
    is_in = ga.types == NodeType.IN
    temp0 = cur
    err0 = stencil.div_error_2d(nxt0.u, nxt0.v, ga.types, pa.dx, pa.dy)

    def cond(carry):
        it, err, _, _ = carry
        return ((it < num_global) | (err > ERR_THRESHOLD)) & (it < MAX_GLOBAL_ITERS + 2)

    def body(carry):
        it, err, temp, nxt = carry
        sol = _explicit_update(cur, temp, pa, dt)
        nxt = State2D(*(jnp.where(is_in, s, n) for n, s in zip(nxt, sol)))
        err = stencil.div_error_2d(nxt.u, nxt.v, ga.types, pa.dx, pa.dy)
        temp = State2D(*(jnp.where(is_in, (t + n) / 2.0, t) for t, n in zip(temp, nxt)))
        return it + 1, err, temp, nxt

    it, err, temp, nxt = jax.lax.while_loop(
        cond, body, (jnp.int32(0), err0, temp0, nxt0))
    nxt = clear_outer(nxt, ga, pa.start_T)
    return nxt, err, it
