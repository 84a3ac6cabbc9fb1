"""3D Chorin projection ("Stable") solver — a TPU-native extension.

The reference declares but never implements a 3D Stable scheme
(FluidSolver3D.cpp:180).  This is the 3D generalization of its 2D projection
solver (StableSolver2D.cpp): explicit advect+diffuse of u, v, w, then a
pressure Poisson solve with reflective Neumann picks on boundary cells via
red-black Gauss-Seidel, then proj = w - grad(q).  T rides along untouched
(as in the 2D scheme).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.types import NodeType
from ..ops import stencil
from .adi3d import ParamsArgs3D
from .common3d import State3D, GridArrays3D

POISSON_ERR_THRESHOLD = 1e-2
MAX_POISSON_ITERS = 4000


def _advect_diffuse(cur: State3D, temp: State3D, pa: ParamsArgs3D, dt):
    dx, dy, dz = pa.dx, pa.dy, pa.dz
    u, v, w, _ = temp

    def upd(f, base):
        fx = stencil.d1(f, dx, 0)
        fy = stencil.d1(f, dy, 1)
        fz = stencil.d1(f, dz, 2)
        lap = (stencil.d2(f, dx, 0) + stencil.d2(f, dy, 1) + stencil.d2(f, dz, 2))
        return base + dt * (-u * fx - v * fy - w * fz + pa.v_vis * lap)

    return upd(u, cur.u), upd(v, cur.v), upd(w, cur.w)


def _poisson_project(wu, wv, ww, ga: GridArrays3D, pa: ParamsArgs3D):
    is_in = ga.types == NodeType.IN
    is_bnd = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    active = is_in | is_bnd

    dx2 = pa.dx * pa.dx
    dy2 = pa.dy * pa.dy
    dz2 = pa.dz * pa.dz
    # weights of the 7-point Laplacian solve
    denom = 2.0 * (dy2 * dz2 + dx2 * dz2 + dx2 * dy2)

    div = jnp.where(is_in,
                    stencil.d1(wu, pa.dx, 0) + stencil.d1(wv, pa.dy, 1)
                    + stencil.d1(ww, pa.dz, 2), 0.0)
    rhs = div * (dx2 * dy2 * dz2)

    shape = wu.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    red = ((ii + jj + kk) % 2 == 0) & active
    black = ((ii + jj + kk) % 2 == 1) & active

    nb_in = [jnp.roll(is_in, sh, ax) for ax in range(3) for sh in (1, -1)]

    def gs_value(q):
        qs = [jnp.roll(q, sh, ax) for ax in range(3) for sh in (1, -1)]
        # reflective picks on boundary cells (2D reference :123-126 pattern)
        picks = []
        for t in range(6):
            opp = t + 1 if t % 2 == 0 else t - 1
            picks.append(jnp.where(is_bnd & ~nb_in[t], qs[opp], qs[t]))
        w_ax = (dy2 * dz2, dy2 * dz2, dx2 * dz2, dx2 * dz2, dx2 * dy2, dx2 * dy2)
        s = sum(p * w for p, w in zip(picks, w_ax))
        return (s - rhs) / denom

    def half_sweep(q, mask):
        qn = gs_value(q)
        dq = qn - q
        rel = jnp.where(qn == 0.0, jnp.where(dq == 0.0, 0.0, jnp.inf),
                        jnp.abs(dq / qn))
        err = jnp.max(jnp.where(mask, rel, 0.0))
        return jnp.where(mask, qn, q), err

    def cond(carry):
        it, err, _ = carry
        return (err >= POISSON_ERR_THRESHOLD) & (it < MAX_POISSON_ITERS)

    def body(carry):
        it, _, q = carry
        q, e1 = half_sweep(q, red)
        q, e2 = half_sweep(q, black)
        return it + 1, jnp.maximum(e1, e2), q

    _, _, q = jax.lax.while_loop(cond, body,
                                 (jnp.int32(0), jnp.float32(1.0),
                                  jnp.zeros_like(wu)))
    return (wu - stencil.d1(q, pa.dx, 0),
            wv - stencil.d1(q, pa.dy, 1),
            ww - stencil.d1(q, pa.dz, 2))


@functools.partial(jax.jit, static_argnames=("num_global", "num_local", "compute_error"))
def stable_timestep_3d(cur: State3D, nxt_prev: State3D, ga: GridArrays3D, dt,
                       num_global: int, num_local: int, pa: ParamsArgs3D,
                       compute_error: bool = True):
    is_in = ga.types == NodeType.IN
    is_bv = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    nxt = State3D(*(jnp.where(is_bv, c, n) for c, n in zip(cur, nxt_prev)))
    temp = cur

    for _ in range(num_global):
        wu, wv, ww = _advect_diffuse(cur, temp, pa, dt)
        wu = jnp.where(is_in, wu, cur.u)
        wv = jnp.where(is_in, wv, cur.v)
        ww = jnp.where(is_in, ww, cur.w)
        pu, pv, pw = _poisson_project(wu, wv, ww, ga, pa)
        nxt = State3D(u=jnp.where(is_in, pu, nxt.u),
                      v=jnp.where(is_in, pv, nxt.v),
                      w=jnp.where(is_in, pw, nxt.w),
                      T=nxt.T)
        temp = State3D(*(jnp.where(is_in, (t + n) / 2.0, t)
                         for t, n in zip(temp, nxt)))

    err = stencil.div_error_3d(nxt.u, nxt.v, nxt.w, ga.types,
                               pa.dx, pa.dy, pa.dz) if compute_error else jnp.float32(-1.0)
    return nxt, err
