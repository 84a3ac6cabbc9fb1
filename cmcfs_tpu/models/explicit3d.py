"""3D explicit Euler solver — a TPU-native extension.

The reference declares but never implements a 3D Explicit scheme
(FluidSolver3D.cpp:179 prints "Explicit solver is not implemented yet!").
This is the natural 3D generalization of its 2D scheme
(ExplicitSolver2D.cpp:54-151): explicit update of u, v, w, T on NODE_IN
cells with advection, the axis-aligned temperature-gradient forcing used by
the ADI scheme (BuildMatrix, AdiSolver3D.cpp:766-796), viscosity, and
dissipation heating; temp re-averaged per global iteration; the divergence
gate uses the 3D metric/threshold.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.types import NodeType
from ..ops import stencil
from .adi3d import ParamsArgs3D, ERR_THRESHOLD
from .common3d import State3D, GridArrays3D

MAX_GLOBAL_ITERS = 100


def _explicit_update(cur: State3D, temp: State3D, pa: ParamsArgs3D, dt):
    dx, dy, dz = pa.dx, pa.dy, pa.dz
    u, v, w, T = temp

    def grad(f):
        return (stencil.d1(f, dx, 0), stencil.d1(f, dy, 1), stencil.d1(f, dz, 2))

    def lap(f):
        return (stencil.d2(f, dx, 0) + stencil.d2(f, dy, 1) + stencil.d2(f, dz, 2))

    def advect(fx, fy, fz):
        return u * fx + v * fy + w * fz

    ux, uy, uz = grad(u)
    vx, vy, vz = grad(v)
    wx, wy, wz = grad(w)
    tx, ty, tz = grad(T)
    diss = (stencil.diss_x_3d(u, v, w, dx, dy, dz)
            + stencil.diss_y_3d(u, v, w, dx, dy, dz)
            + stencil.diss_z_3d(u, v, w, dx, dy, dz))

    nu = cur.u + dt * (-advect(ux, uy, uz) - pa.v_T * tx + pa.v_vis * lap(u))
    nv = cur.v + dt * (-advect(vx, vy, vz) - pa.v_T * ty + pa.v_vis * lap(v))
    nw = cur.w + dt * (-advect(wx, wy, wz) - pa.v_T * tz + pa.v_vis * lap(w))
    nT = cur.T + dt * (-advect(tx, ty, tz) + pa.t_vis * lap(T) + pa.t_phi * diss)
    return State3D(nu, nv, nw, nT)


@functools.partial(jax.jit, static_argnames=("num_global", "num_local", "compute_error"))
def explicit_timestep_3d(cur: State3D, nxt_prev: State3D, ga: GridArrays3D, dt,
                         num_global: int, num_local: int, pa: ParamsArgs3D,
                         compute_error: bool = True):
    is_in = ga.types == NodeType.IN
    is_bv = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    nxt = State3D(*(jnp.where(is_bv, c, n) for c, n in zip(cur, nxt_prev)))
    temp = cur

    for _ in range(num_global):
        sol = _explicit_update(cur, temp, pa, dt)
        nxt = State3D(*(jnp.where(is_in, s, n) for n, s in zip(nxt, sol)))
        temp = State3D(*(jnp.where(is_in, (t + n) / 2.0, t)
                         for t, n in zip(temp, nxt)))

    err = stencil.div_error_3d(nxt.u, nxt.v, nxt.w, ga.types,
                               pa.dx, pa.dy, pa.dz) if compute_error else jnp.float32(-1.0)
    return nxt, err
