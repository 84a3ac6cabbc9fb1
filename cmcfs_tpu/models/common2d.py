"""Shared 2D solver state and grid-array plumbing.

State and grid data live as jnp pytrees; every per-step mutation from the
reference (UpdateBoundaries / SetGridBoundaries / ClearOutterCells /
GetLayer — src/FluidSolver2D/Solver2D.cpp:21-85) has a pure functional
equivalent here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.types import NodeType, BCtype
from ..geom.raster2d import Grid2D
from ..ops import masks


class State2D(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    T: jnp.ndarray


class GridArrays2D(NamedTuple):
    types: jnp.ndarray    # (dimx, dimy) int8
    bct: jnp.ndarray      # (dimx, dimy) int8 (BCtype)
    bc_u: jnp.ndarray     # (dimx, dimy) f32
    bc_v: jnp.ndarray
    bc_T: jnp.ndarray
    cls_x: jnp.ndarray    # line classes, sweep along axis 0
    cls_y: jnp.ndarray    # sweep along axis 1


def grid_arrays(grid: Grid2D) -> GridArrays2D:
    """Host rasterized grid -> device arrays incl. dense line classes."""
    t = grid.cur_types
    return GridArrays2D(
        types=jnp.asarray(t),
        bct=jnp.asarray(grid.cur_bct),
        bc_u=jnp.asarray(grid.cur_vel[..., 0]),
        bc_v=jnp.asarray(grid.cur_vel[..., 1]),
        bc_T=jnp.asarray(grid.cur_T),
        cls_x=jnp.asarray(masks.line_class_2d(t, axis=0)),
        cls_y=jnp.asarray(masks.line_class_2d(t, axis=1)),
    )


def init_state(grid: Grid2D) -> State2D:
    """Initial layer from grid data (reference AdiSolver2D::Init, :37-49)."""
    return State2D(
        u=jnp.asarray(grid.cur_vel[..., 0]),
        v=jnp.asarray(grid.cur_vel[..., 1]),
        T=jnp.asarray(grid.cur_T),
    )


def update_boundaries(state: State2D, ga: GridArrays2D) -> State2D:
    """Impose grid BC values on BOUND/VALVE cells (Solver2D.cpp:48-63)."""
    m = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    return State2D(
        u=jnp.where(m, ga.bc_u, state.u),
        v=jnp.where(m, ga.bc_v, state.v),
        T=jnp.where(m, ga.bc_T, state.T),
    )


def clear_outer(state: State2D, ga: GridArrays2D, start_T: float) -> State2D:
    """Zero velocity / reset T on OUT cells (Solver2D.cpp:75-85)."""
    m = ga.types == NodeType.OUT
    return State2D(
        u=jnp.where(m, 0.0, state.u),
        v=jnp.where(m, 0.0, state.v),
        T=jnp.where(m, start_T, state.T),
    )


def get_layer(state: State2D, outdimx: int, outdimy: int):
    """Nearest-neighbour downsample (Solver2D.cpp:21-35). Host-side."""
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    T = np.asarray(state.T)
    dimx, dimy = u.shape
    if outdimx == 0:
        outdimx = dimx
    if outdimy == 0:
        outdimy = dimy
    xi = (np.arange(outdimx) * dimx) // outdimx
    yi = (np.arange(outdimy) * dimy) // outdimy
    return u[np.ix_(xi, yi)], v[np.ix_(xi, yi)], T[np.ix_(xi, yi)].astype(np.float64)


def bc_rows_2d(var_bc_val, bct, free_code=BCtype.FREE):
    """2D boundary-row coefficients (AdiSolver2D.cpp:74-116).

    NOSLIP: Dirichlet row (b=1, c=0, d=value).
    FREE:   BC0 x0 - x1 = 0;  BC1 x_{n-2} - x_{n-1} = 0  (note +1/-1 signs,
    unlike the 3D free-extrapolation rows).
    Returns (b0, c0, d0, a1, b1, d1) as full arrays.
    """
    free = bct == free_code
    one = jnp.float32(1.0)
    b0 = jnp.where(free, one, one)
    c0 = jnp.where(free, -one, 0.0)
    d0 = jnp.where(free, 0.0, var_bc_val)
    a1 = jnp.where(free, one, 0.0)
    b1 = jnp.where(free, -one, one)
    d1 = jnp.where(free, 0.0, var_bc_val)
    return b0, c0, d0, a1, b1, d1
