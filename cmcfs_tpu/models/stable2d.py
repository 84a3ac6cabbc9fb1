"""2D Chorin-projection ("Stable Fluids") solver.

Reference: src/FluidSolver2D/StableSolver2D.cpp — explicit advect+diffuse of
u, v into an intermediate field w (:56-82), then a Poisson pressure solve
with reflective Neumann picks on boundary cells (:84-151), then
proj = w - grad(q) (:156-163).  T is never advanced by this scheme (the
reference solves only U and V; temperature rides along through the merge).

Two Poisson modes:

* ``redblack`` (default, TPU hot path): red-black Gauss-Seidel half-sweeps
  with the same update formula, reflective picks and convergence criterion;
  same fixed point, same asymptotic rate, trajectories agree to solver
  tolerance (1e-2) rather than step-for-step.
* ``sequential`` (parity mode): reproduces the reference's EXACT iteration
  order (StableSolver2D.cpp:117-149).  Analysis of that loop: the boundary
  pass never reads an already-updated boundary cell (the reflective picks
  select IN neighbours — untouched in that pass — or later-ordered cells),
  so it is Jacobi-equivalent and fully vectorizable; the inner pass in
  lexicographic (i, j) order reads new values only at (i-1, j) and
  (i, j-1), so anti-diagonal wavefronts (i + j = const) reproduce the
  sequential updates value-for-value.  Remaining deviation: the reference
  computes q_new and the error in double and stores float; we compute in
  f32 (TPU has no f64), a ±1-ulp-per-update difference — trajectories
  match the C solver to output-print quantum (tests/test_parity_stable.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.types import NodeType
from ..ops import stencil
from .adi2d import ParamsArgs
from .common2d import State2D, GridArrays2D, clear_outer

DIV_ERR_THRESHOLD = 0.1        # reference StableSolver2D.h:23
POISSON_ERR_THRESHOLD = 1e-2   # reference StableSolver2D.h:24
MAX_GLOBAL_ITERS = 100
MAX_POISSON_ITERS = 4000       # safety cap (reference iterates unboundedly)


def _advect_diffuse(cur: State2D, temp: State2D, pa: ParamsArgs, dt):
    """SolveU/SolveV (StableSolver2D.cpp:56-82) — no temperature forcing."""
    dx, dy = pa.dx, pa.dy
    u, v, _ = temp
    ux = stencil.d1(u, dx, 0); uy = stencil.d1(u, dy, 1)
    vx = stencil.d1(v, dx, 0); vy = stencil.d1(v, dy, 1)
    uxx = stencil.d2(u, dx, 0); uyy = stencil.d2(u, dy, 1)
    vxx = stencil.d2(v, dx, 0); vyy = stencil.d2(v, dy, 1)
    nu = cur.u + dt * (-u * ux - v * uy + pa.v_vis * (uxx + uyy))
    nv = cur.v + dt * (-u * vx - v * vy + pa.v_vis * (vxx + vyy))
    return nu, nv


def _poisson_project(wu, wv, ga: GridArrays2D, pa: ParamsArgs,
                     mode: str = "redblack"):
    """Pressure Poisson (reference Project, :84-164); see module docstring
    for the two iteration modes."""
    is_in = ga.types == NodeType.IN
    is_bnd = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    active = is_in | is_bnd

    dx2 = pa.dx * pa.dx
    dy2 = pa.dy * pa.dy
    rcp = 0.5 / (dx2 + dy2)

    div = jnp.where(is_in,
                    stencil.d1(wu, pa.dx, 0) + stencil.d1(wv, pa.dy, 1), 0.0)
    rhs = div * (dx2 * dy2)

    dimx, dimy = wu.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (dimx, dimy), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (dimx, dimy), 1)
    red = ((ii + jj) % 2 == 0) & active
    black = ((ii + jj) % 2 == 1) & active

    in_w = jnp.roll(is_in, 1, 0)     # type of (i-1, j)
    in_e = jnp.roll(is_in, -1, 0)
    in_s = jnp.roll(is_in, 1, 1)
    in_n = jnp.roll(is_in, -1, 1)

    def gs_value(q):
        qw = jnp.roll(q, 1, 0)
        qe = jnp.roll(q, -1, 0)
        qs = jnp.roll(q, 1, 1)
        qn = jnp.roll(q, -1, 1)
        # boundary cells use reflective picks (:123-126); inner use neighbours
        i0 = jnp.where(is_bnd & ~in_w, qe, qw)
        i1 = jnp.where(is_bnd & ~in_e, qw, qe)
        j0 = jnp.where(is_bnd & ~in_s, qn, qs)
        j1 = jnp.where(is_bnd & ~in_n, qs, qn)
        return rcp * ((i0 + i1) * dy2 + (j0 + j1) * dx2 - rhs)

    if mode == "sequential":
        return _project_sequential(wu, wv, gs_value, is_in, is_bnd,
                                   ii, jj, pa)

    def half_sweep(q, mask):
        qn = gs_value(q)
        dq = qn - q
        rel = jnp.where(qn == 0.0,
                        jnp.where(dq == 0.0, 0.0, jnp.inf),
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

    q0 = jnp.zeros_like(wu)
    _, _, q = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0), q0))

    pu = wu - stencil.d1(q, pa.dx, 0)
    pv = wv - stencil.d1(q, pa.dy, 1)
    return pu, pv


def _project_sequential(wu, wv, gs_value, is_in, is_bnd, ii, jj, pa):
    """Reference-exact Gauss-Seidel order (StableSolver2D.cpp:111-151):
    one vectorized boundary pass (Jacobi-equivalent — the reflective picks
    never read an already-updated boundary cell), then inner cells as
    anti-diagonal wavefronts (each inner update reads new values only at
    (i-1, j), (i, j-1)).  The convergence error replicates the C
    sequential max-chain semantics including its NaN behaviour: with
    std::max(cur_err, acc), a NaN acc is REPLACED by the next non-NaN
    cur_err, so the effective error is the max over cells AFTER the last
    NaN in (boundary-lex, inner-lex) processing order — computed here in
    closed form over the whole field."""
    dimx, dimy = wu.shape
    nwaves = dimx + dimy - 1
    diag = ii + jj
    lex = ii * dimy + jj
    keys = jnp.where(is_bnd, lex,
                     jnp.where(is_in, lex + dimx * dimy, -1))

    def sweep(q):
        qb_new = gs_value(q)
        rel_b = jnp.abs((qb_new - q) / qb_new)   # raw C semantics (inf/NaN)
        q = jnp.where(is_bnd, qb_new, q)

        def wave(k, carry):
            q, rel = carry
            mask = is_in & (diag == k)
            qn = gs_value(q)
            r = jnp.abs((qn - q) / qn)
            rel = jnp.where(mask, r, rel)
            q = jnp.where(mask, qn, q)
            return q, rel

        q, rel_i = jax.lax.fori_loop(0, nwaves, wave,
                                     (q, jnp.zeros_like(q)))
        rel = jnp.where(is_bnd, rel_b, rel_i)
        nan_keys = jnp.where(jnp.isnan(rel) & (keys >= 0), keys, -1)
        last_nan = jnp.max(nan_keys)
        sel = keys > last_nan
        err = jnp.where(jnp.any(sel),
                        jnp.max(jnp.where(sel, rel, -jnp.inf)),
                        jnp.nan)
        return q, err

    def cond(carry):
        it, err, _ = carry
        return (err >= POISSON_ERR_THRESHOLD) & (it < MAX_POISSON_ITERS)

    def body(carry):
        it, _, q = carry
        q, err = sweep(q)
        return it + 1, err, q

    q, err = sweep(jnp.zeros_like(wu))           # do-while: >= 1 sweep
    _, _, q = jax.lax.while_loop(cond, body, (jnp.int32(1), err, q))

    pu = wu - stencil.d1(q, pa.dx, 0)
    pv = wv - stencil.d1(q, pa.dy, 1)
    return pu, pv


@functools.partial(jax.jit, static_argnames=("num_local", "mode"))
def stable_timestep_2d(cur: State2D, nxt0: State2D, ga: GridArrays2D, dt,
                       num_global, num_local: int, pa: ParamsArgs,
                       mode: str = "redblack"):
    """One reference TimeStep (StableSolver2D.cpp:190-234)."""
    is_in = ga.types == NodeType.IN
    temp0 = cur
    err0 = stencil.div_error_2d(nxt0.u, nxt0.v, ga.types, pa.dx, pa.dy)

    def cond(carry):
        it, err, _, _ = carry
        return ((it < num_global) | (err > DIV_ERR_THRESHOLD)) & (it < MAX_GLOBAL_ITERS + 2)

    def body(carry):
        it, err, temp, nxt = carry
        wu_full, wv_full = _advect_diffuse(cur, temp, pa, dt)
        # next_w = cur copy, updated on IN cells only (:202-206)
        wu = jnp.where(is_in, wu_full, cur.u)
        wv = jnp.where(is_in, wv_full, cur.v)
        pu, pv = _poisson_project(wu, wv, ga, pa, mode=mode)
        nxt = State2D(u=jnp.where(is_in, pu, nxt.u),
                      v=jnp.where(is_in, pv, nxt.v),
                      T=nxt.T)
        err = stencil.div_error_2d(nxt.u, nxt.v, ga.types, pa.dx, pa.dy)
        temp = State2D(*(jnp.where(is_in, (t + n) / 2.0, t) for t, n in zip(temp, nxt)))
        return it + 1, err, temp, nxt

    it, err, temp, nxt = jax.lax.while_loop(
        cond, body, (jnp.int32(0), err0, temp0, nxt0))
    nxt = clear_outer(nxt, ga, pa.start_T)
    return nxt, err, it
