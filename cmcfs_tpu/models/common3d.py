"""Shared 3D solver state and grid-array plumbing (device pytrees)."""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.types import NodeType, BCtype, MISSING_VALUE
from ..geom.grid3d import Grid3D
from ..ops import masks


class State3D(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    T: jnp.ndarray


class GridArrays3D(NamedTuple):
    types: jnp.ndarray      # (nx, ny, nz) int8
    bc_vel: jnp.ndarray     # int8
    bc_temp: jnp.ndarray    # int8
    val_u: jnp.ndarray      # boundary values per var
    val_v: jnp.ndarray
    val_w: jnp.ndarray
    val_T: jnp.ndarray
    cls_a: tuple            # per-axis line classes (pass A)
    cls_b: tuple            # per-axis pass-B classes (None entries if no duals)
    take_b: tuple


def grid_arrays(grid: Grid3D, elide_inert_duals: bool = True) -> GridArrays3D:
    t = grid.types
    bcv = np.asarray(grid.bc_vel)
    bct = np.asarray(grid.bc_temp)
    cls_a, cls_b, take_b = [], [], []
    for ax in range(3):
        lc = masks.line_class_3d(t, axis=ax)
        cb, tb = lc.cls_b, lc.take_b
        if cb is not None and elide_inert_duals:
            # cls_a and cls_b differ ONLY at dual cells (BC1 vs BC0 role,
            # ops/masks.py).  For a Dirichlet (non-FREE) boundary BOTH
            # roles generate the identical identity row (a=0, b=1, c=0,
            # d=value — ops/sweep_common.build_abc / adi3d._bc_rows_3d),
            # so when every dual cell is Dirichlet for velocity AND
            # temperature, pass B's solve is bitwise pass A's and the
            # take_b stitch is a no-op: drop the pass entirely.  This is
            # the common case — internal walls are NOSLIP (e.g. the
            # box_pipe bench case's Y-direction duals) — and it keeps the
            # direction on the fused num_local-pair hot path.  The
            # reference's "start-role value wins" write order
            # (Grid3D.cpp:47-127) is preserved trivially: both roles
            # write the same value.
            dual = lc.cls_a != cb
            if ((bcv[dual] != BCtype.FREE).all()
                    and (bct[dual] != BCtype.FREE).all()):
                cb = tb = None
        cls_a.append(jnp.asarray(lc.cls_a))
        cls_b.append(None if cb is None else jnp.asarray(cb))
        take_b.append(None if tb is None else jnp.asarray(tb))
    return GridArrays3D(
        types=jnp.asarray(t),
        bc_vel=jnp.asarray(grid.bc_vel),
        bc_temp=jnp.asarray(grid.bc_temp),
        val_u=jnp.asarray(grid.vel[..., 0]),
        val_v=jnp.asarray(grid.vel[..., 1]),
        val_w=jnp.asarray(grid.vel[..., 2]),
        val_T=jnp.asarray(grid.T),
        cls_a=tuple(cls_a), cls_b=tuple(cls_b), take_b=tuple(take_b),
    )


def init_state(grid: Grid3D) -> State3D:
    """CopyFromGrid for all cells (reference TimeLayer3D.h:734-781)."""
    return State3D(
        u=jnp.asarray(grid.vel[..., 0]),
        v=jnp.asarray(grid.vel[..., 1]),
        w=jnp.asarray(grid.vel[..., 2]),
        T=jnp.asarray(grid.T),
    )


def update_boundaries(state: State3D, ga: GridArrays3D) -> State3D:
    """Impose grid values on BOUND/VALVE cells (AdiSolver3D.cpp:286-304)."""
    m = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    return State3D(
        u=jnp.where(m, ga.val_u, state.u),
        v=jnp.where(m, ga.val_v, state.v),
        w=jnp.where(m, ga.val_w, state.w),
        T=jnp.where(m, ga.val_T, state.T),
    )


def get_layer(state: State3D, ga: GridArrays3D, outdimx: int, outdimy: int,
              outdimz: int):
    """Clear OUT cells to MISSING_VALUE + nearest downsample
    (Solver3D.cpp:21-25 + FilterToArrays, TimeLayer3D.h:819-924). Host-side."""
    out = np.asarray(ga.types) == NodeType.OUT
    arrs = []
    for f in state:
        a = np.asarray(f).copy()
        a[out] = MISSING_VALUE
        arrs.append(a)
    u, v, w, T = arrs
    nx, ny, nz = u.shape
    outdimx = outdimx or nx
    outdimy = outdimy or ny
    outdimz = outdimz or nz
    xi = (np.arange(outdimx) * nx) // outdimx
    yi = (np.arange(outdimy) * ny) // outdimy
    zi = (np.arange(outdimz) * nz) // outdimz
    sel = np.ix_(xi, yi, zi)
    return u[sel], v[sel], w[sel], T[sel].astype(np.float64)
