"""Central-difference stencils, dissipation functions, divergence error.

Dense jnp equivalents of the reference accessors (2D: TimeLayer2D.h:44-102,
3D: TimeLayer3D.h:338-343, 553-641).  Shifted values at the array border wrap
(jnp.roll); every consumer masks those cells out, matching the reference,
which simply never evaluates stencils there.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.types import NodeType


def shift(f: jnp.ndarray, offset: int, axis: int) -> jnp.ndarray:
    """f shifted so that result[i] = f[i + offset]."""
    return jnp.roll(f, -offset, axis=axis)


def d1(f: jnp.ndarray, h: float, axis: int) -> jnp.ndarray:
    """(f[i+1] - f[i-1]) / (2h)"""
    return (shift(f, 1, axis) - shift(f, -1, axis)) / (2 * h)


def d2(f: jnp.ndarray, h: float, axis: int) -> jnp.ndarray:
    """(f[i+1] - 2 f[i] + f[i-1]) / h^2"""
    return (shift(f, 1, axis) - 2 * f + shift(f, -1, axis)) / (h * h)


# --------------------------------------------------------------------- 2D
def diss_x_2d(u, v, dx, dy):
    """2 ux^2 + vx^2 + uy*vx (TimeLayer2D.h:63-71)."""
    ux = d1(u, dx, 0)
    vx = d1(v, dx, 0)
    uy = d1(u, dy, 1)
    return 2 * ux * ux + vx * vx + uy * vx


def diss_y_2d(u, v, dx, dy):
    """uy^2 + 2 vy^2 + vx*uy (TimeLayer2D.h:73-81)."""
    vx = d1(v, dx, 0)
    uy = d1(u, dy, 1)
    vy = d1(v, dy, 1)
    return uy * uy + 2 * vy * vy + vx * uy


def div_error_2d(u, v, types, dx, dy):
    """Mean |div| over all-IN 2x2 quads (TimeLayer2D.h:88-102).

    The reference expression contains an operator-precedence quirk
    (`dy * du_j + du_{j+1} / 2`) which we reproduce verbatim.
    """
    is_in = types == NodeType.IN
    quad = (is_in[:-1, :-1] & is_in[1:, :-1] & is_in[:-1, 1:] & is_in[1:, 1:])
    u00 = u[:-1, :-1]; u10 = u[1:, :-1]; u01 = u[:-1, 1:]; u11 = u[1:, 1:]
    v00 = v[:-1, :-1]; v10 = v[1:, :-1]; v01 = v[:-1, 1:]; v11 = v[1:, 1:]
    tx = dy * (u10 - u00) + (u11 - u01) / 2
    ty = dx * (v01 - v00) + (v11 - v10) / 2
    err = jnp.where(quad, jnp.abs(tx + ty), 0.0)
    count = jnp.sum(quad)
    return jnp.sum(err) / jnp.maximum(count, 1)


# --------------------------------------------------------------------- 3D
def diss_x_3d(u, v, w, dx, dy, dz):
    """2 ux^2 + vx^2 + wx^2 + vx*uy + wx*uz (TimeLayer3D.h:553-563)."""
    ux = d1(u, dx, 0); vx = d1(v, dx, 0); wx = d1(w, dx, 0)
    uy = d1(u, dy, 1); uz = d1(u, dz, 2)
    return 2 * ux * ux + vx * vx + wx * wx + vx * uy + wx * uz


def diss_y_3d(u, v, w, dx, dy, dz):
    """uy^2 + 2 vy^2 + wy^2 + uy*vx + wy*vz (TimeLayer3D.h:566-576)."""
    uy = d1(u, dy, 1); vy = d1(v, dy, 1); wy = d1(w, dy, 1)
    vx = d1(v, dx, 0); vz = d1(v, dz, 2)
    return uy * uy + 2 * vy * vy + wy * wy + uy * vx + wy * vz


def diss_z_3d(u, v, w, dx, dy, dz):
    """uz^2 + vz^2 + 2 wz^2 + uz*wx + vz*wy (TimeLayer3D.h:578-588)."""
    uz = d1(u, dz, 2); vz = d1(v, dz, 2); wz = d1(w, dz, 2)
    wx = d1(w, dx, 0); wy = d1(w, dy, 1)
    return uz * uz + vz * vz + 2 * wz * wz + uz * wx + vz * wy


def div_error_3d(u, v, w, types, dx, dy, dz):
    """Staggered-corner divergence metric (TimeLayer3D.h:595-641).

    Mean over NODE_IN cells with i<=dimx-2, j<=dimy-2, k<=dimz-2 of
    |corner-averaged flux divergence|.  The face sums read (i-1, j-1, k-1)
    neighbours; IN cells never sit on the low border in valid scenes.
    """
    def corner_sum_x(f):
        # f(i,j,k)+f(i,j-1,k)+f(i,j-1,k-1)+f(i,j,k-1)
        fm_j = shift(f, -1, 1)
        fm_k = shift(f, -1, 2)
        fm_jk = shift(fm_j, -1, 2)
        return f + fm_j + fm_jk + fm_k

    def corner_sum_y(f):
        fm_i = shift(f, -1, 0)
        fm_k = shift(f, -1, 2)
        fm_ik = shift(fm_i, -1, 2)
        return f + fm_i + fm_ik + fm_k

    def corner_sum_z(f):
        fm_i = shift(f, -1, 0)
        fm_j = shift(f, -1, 1)
        fm_ij = shift(fm_i, -1, 1)
        return f + fm_j + fm_ij + fm_i

    su = corner_sum_x(u)
    sv = corner_sum_y(v)
    sw = corner_sum_z(w)
    err_x = (su - shift(su, -1, 0)) * (dz * dy / 4.0)
    err_y = (sv - shift(sv, -1, 1)) * (dx * dz / 4.0)
    err_z = (sw - shift(sw, -1, 2)) * (dx * dy / 4.0)

    is_in = types == NodeType.IN
    mask = is_in
    mask = mask.at[-1, :, :].set(False)
    mask = mask.at[:, -1, :].set(False)
    mask = mask.at[:, :, -1].set(False)
    err = jnp.where(mask, jnp.abs(err_x + err_y + err_z), 0.0)
    count = jnp.sum(mask)
    return jnp.sum(err) / jnp.maximum(count, 1)


def smooth_masked(f, dest, mask, axes):
    """Neighbour-averaged smoothing on masked cells (reference
    ScalarField3D::Smooth, used by the commented-out smoothing pass in
    AdiSolver3D::TimeStep :359-360): dest = mean of self and face neighbours
    where mask, else dest unchanged."""
    acc = f
    cnt = 1.0
    for ax in axes:
        acc = acc + shift(f, 1, ax) + shift(f, -1, ax)
        cnt += 2.0
    return jnp.where(mask, acc / cnt, dest)
