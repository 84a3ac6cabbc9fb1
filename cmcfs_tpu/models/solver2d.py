"""Stateful 2D solver wrappers around the pure jitted steps.

Mirrors the reference Solver2D lifecycle (Init / UpdateBoundaries /
TimeStep / SetGridBoundaries / GetLayer — src/FluidSolver2D/Solver2D.h) while
keeping all per-step numerics as pure JAX functions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams
from ..geom.raster2d import Grid2D
from . import adi2d, explicit2d, stable2d
from .common2d import (State2D, grid_arrays, init_state, update_boundaries,
                       get_layer)


class SolverError(RuntimeError):
    """Raised where the reference would print and exit(1)."""


class Solver2DBase:
    name = "base"

    def __init__(self, backend: str = "auto", exact: bool = True):
        self.backend = backend
        self.exact = exact
        self.grid: Grid2D | None = None
        self.params: FluidParams | None = None
        self.cur: State2D | None = None
        self.next: State2D | None = None
        self.last_err = 0.0
        self.last_iters = 0

    def init(self, grid: Grid2D, params: FluidParams) -> None:
        self.grid = grid
        self.params = params
        self.ga = grid_arrays(grid)
        self.stream_ok = adi2d.stream_ok_2d(self.ga)
        self.cur = init_state(grid)
        self.next = self.cur
        f32 = jnp.float32
        self.pa = adi2d.ParamsArgs(
            v_T=f32(params.v_T), v_vis=f32(params.v_vis),
            t_vis=f32(params.t_vis), t_phi=f32(params.t_phi),
            dx=f32(grid.dx), dy=f32(grid.dy), start_T=f32(grid.start_T))

    def refresh_grid(self) -> None:
        """Re-upload grid arrays after a host-side Prepare() rebuild."""
        self.ga = grid_arrays(self.grid)
        self.stream_ok = adi2d.stream_ok_2d(self.ga)

    def update_boundaries(self) -> None:
        self.cur = update_boundaries(self.cur, self.ga)
        self.next = update_boundaries(self.next, self.ga)

    def set_grid_boundaries(self) -> None:
        self.grid.set_field_data(np.asarray(self.cur.u), np.asarray(self.cur.v))

    def get_layer(self, outdimx: int, outdimy: int):
        return get_layer(self.next, outdimx, outdimy)

    def set_layer(self, u, v, T) -> None:
        """Restore a checkpointed layer (reference Solver2D::SetLayer)."""
        self.cur = State2D(u=jnp.asarray(u, jnp.float32),
                           v=jnp.asarray(v, jnp.float32),
                           T=jnp.asarray(T, jnp.float32))

    def _check(self, err: float, iters: int, threshold: float) -> None:
        if iters > adi2d.MAX_GLOBAL_ITERS:
            raise SolverError(f"Exceeded max number of iterations ({adi2d.MAX_GLOBAL_ITERS})")
        # NaN-safe: the reference aborts on blow-up (exit(1)); a NaN error
        # means the state diverged past f32 range and must abort too
        if not (err <= threshold * 10):
            raise SolverError(f"Error is too big! {err}")

    def time_step(self, dt: float, num_global: int, num_local: int) -> None:
        raise NotImplementedError


class AdiSolver2D(Solver2DBase):
    name = "ADI"

    def __init__(self, backend: str = "auto", exact: bool = True):
        if backend == "auto":
            import jax
            # fused single-kernel sweeps on TPU (as in 3D); scan elsewhere
            backend = ("fused_dma" if jax.default_backend() == "tpu"
                       else "scan")
        super().__init__(backend, exact)

    def time_step(self, dt: float, num_global: int, num_local: int) -> None:
        nxt, err, it = adi2d.adi_timestep_2d(
            self.cur, self.ga, jnp.float32(dt), jnp.int32(num_global), num_local,
            self.pa, backend=self.backend, exact=self.exact,
            stream_ok=getattr(self, "stream_ok", (False, False)))
        self.last_err = float(err)
        self.last_iters = int(it)
        self._check(self.last_err, self.last_iters, adi2d.ERR_THRESHOLD)
        self.next = nxt
        self.cur = nxt


class ExplicitSolver2D(Solver2DBase):
    name = "Explicit"

    def time_step(self, dt: float, num_global: int, num_local: int) -> None:
        nxt, err, it = explicit2d.explicit_timestep_2d(
            self.cur, self.next, self.ga, jnp.float32(dt), jnp.int32(num_global),
            num_local, self.pa)
        self.last_err = float(err)
        self.last_iters = int(it)
        self._check(self.last_err, self.last_iters, explicit2d.ERR_THRESHOLD)
        self.next = nxt
        self.cur = nxt


class StableSolver2D(Solver2DBase):
    name = "Stable"

    def time_step(self, dt: float, num_global: int, num_local: int) -> None:
        # backend "sequential" selects the reference-exact GS order
        # (stable2d._project_sequential); anything else is red-black
        mode = "sequential" if self.backend == "sequential" else "redblack"
        nxt, err, it = stable2d.stable_timestep_2d(
            self.cur, self.next, self.ga, jnp.float32(dt), jnp.int32(num_global),
            num_local, self.pa, mode=mode)
        self.last_err = float(err)
        self.last_iters = int(it)
        self._check(self.last_err, self.last_iters, stable2d.DIV_ERR_THRESHOLD)
        self.next = nxt
        self.cur = nxt


def make_solver(name: str, backend: str = "auto", exact: bool = True) -> Solver2DBase:
    return {"ADI": AdiSolver2D, "Explicit": ExplicitSolver2D,
            "Stable": StableSolver2D}[name](backend=backend, exact=exact)
