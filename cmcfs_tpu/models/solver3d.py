"""Stateful 3D solver wrappers (reference Solver3D/AdiSolver3D lifecycle).

The reference exposes three scheme names for 3D but only implements ADI
(FluidSolver3D.cpp:177-190 prints "not implemented" for Explicit/Stable);
here all three run — Explicit and Stable are TPU-native extensions
(models/explicit3d.py, models/stable3d.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams
from ..geom.grid3d import Grid3D
from . import adi3d, explicit3d, stable3d
from .common3d import (State3D, grid_arrays, init_state, update_boundaries,
                       get_layer)
from .solver2d import SolverError


class AdiSolver3D:
    name = "ADI"

    def __init__(self, backend: str = "auto", exact: bool = True):
        if backend == "auto":
            import jax
            # num_local-fused streamed sweeps on TPU (two local iterations
            # per kernel invocation, ops/pallas_sweep_nl.py — bitwise vs
            # fused_full and +14.5% at 256^3 ng=4 nl=2, RESULTS.md round 3;
            # it self-degrades to the per-iteration stream kernel at nl<2 /
            # under a mesh, and further to fused_dma wherever the stream
            # guarantees fail: duals, long lines); exact-order scan elsewhere
            backend = ("fused_nl" if jax.default_backend() == "tpu"
                       else "scan")
        self.backend = backend
        self.exact = exact
        self.last_err = 0.0
        self.plan = None

    def init(self, grid: Grid3D, params: FluidParams) -> None:
        import numpy as np
        from ..core.types import NodeType
        from ..ops.masks import INTERIOR
        self.grid = grid
        self.params = params
        self.ga = grid_arrays(grid)
        # the full-fusion kernel may fold the NODE_IN merges in-kernel only
        # when interior rows coincide exactly with IN cells for that axis
        is_in = grid.types == NodeType.IN
        self.merge_ok = tuple(
            bool(((np.asarray(self.ga.cls_a[ax]) == INTERIOR) == is_in).all())
            for ax in range(3))
        self.cur = init_state(grid)
        self.next = self.cur
        f32 = jnp.float32
        self.pa = adi3d.ParamsArgs3D(
            v_T=f32(params.v_T), v_vis=f32(params.v_vis),
            t_vis=f32(params.t_vis), t_phi=f32(params.t_phi),
            dx=f32(grid.dx), dy=f32(grid.dy), dz=f32(grid.dz))

    def set_plan(self, plan, nblockz: int = 0, balance: str | None = None) -> None:
        """Shard state/grid over an X mesh (the GPUplan/PARAplan analogue).

        GSPMD shards evenly (unlike the reference's uneven split1D), so the
        X extent is padded with inert OUT planes (identity rows everywhere;
        no physics) and cropped again at output time.  With ``balance``
        (EVEN_SEGMENTS / EVEN_VOLUME — reference SplitSegments_X,
        Grid3D.cpp:148-235) the padding planes are inserted at load-optimal
        safe positions instead of the end, so the even GSPMD cuts carry
        near-equal work (parallel/balance.plan_padding).
        """
        import jax
        import numpy as np
        from ..core.types import NodeType
        if nblockz:
            from ..parallel.mesh import ShardingPlan
            plan = ShardingPlan(plan.mesh, plan.axis, nblockz)
        self.plan = plan
        n = plan.mesh.devices.size
        dimx = self.grid.dimx
        pad = (-dimx) % n
        self._pad_x = 0
        self._x_keep = None
        if pad or balance:
            g = self.grid
            if balance:
                from ..parallel import balance as bal
                ins = bal.plan_padding(np.asarray(g.types), n, policy=balance)
            else:
                ins = [dimx] * pad
            if ins:
                import copy
                gp = copy.copy(g)
                gp.types = np.insert(g.types, ins, NodeType.OUT, axis=0)
                gp.bc_vel = np.insert(g.bc_vel, ins, 0, axis=0)
                gp.bc_temp = np.insert(g.bc_temp, ins, 0, axis=0)
                gp.vel = np.insert(g.vel, ins, 0.0, axis=0)
                gp.T = np.insert(g.T, ins, np.float32(g.base_T), axis=0)
                gp.dimx = dimx + len(ins)
                self.ga = grid_arrays(gp)
                self.cur = init_state(gp)
                self.next = self.cur
                inserted = [p + i for i, p in enumerate(sorted(ins))]
                if inserted == list(range(dimx, dimx + len(ins))):
                    self._pad_x = len(ins)     # trailing-only: cheap crop
                else:
                    self._x_keep = np.delete(np.arange(gp.dimx), inserted)
        self.cur = plan.shard_state(self.cur)
        self.next = plan.shard_state(self.next)
        self.ga = plan.shard_grid(self.ga)

    def refresh_grid(self) -> None:
        self.ga = grid_arrays(self.grid)

    def dispatch_report(self, num_local: int) -> dict:
        """Static execution-path visibility (the reference's
        OutputSegmentsInfo analogue, AdiSolver3D.cpp:270-284): which kernel
        path each direction takes, whether the stacked-carry step engages —
        see adi3d.dispatch_report."""
        return adi3d.dispatch_report(
            tuple(self.cur.u.shape), self.ga, self.backend, num_local,
            getattr(self, "merge_ok", (False, False, False)), self.plan)

    def carried_runner(self, num_local: int):
        """Static setup for the carried-state loop (adi3d.nl_carried_*), or
        None when it cannot engage (non-targeted dispatch; sharded grids
        whose Y extent doesn't split evenly).  Drivers that own the step
        loop (cli3d ``carried`` flag, bench.py --carried) keep the
        simulation state stacked in the Z kernel layout ACROSS steps —
        bitwise equal to the per-step path for static-boundary grids
        (tests/test_carried.py), −7.3%/step on silicon
        (bench_logs/probe_carried_r4.log).  Sharded runs carry the state
        grid-Y-sharded and run the same per-shard targeted kernels
        (round 5 — the reference keeps state device-resident across
        TimeSteps in its multi-GPU path too, FluidSolver3D.cpp:226-262)."""
        pre = adi3d.nl_carried_pre(self.ga, self.backend, num_local,
                                   self.merge_ok, plan=self.plan)
        if pre is None and self.plan is not None:
            import warnings
            # mirror the NL_TARGETED VMEM-degrade warning: a sharded run
            # silently giving up the carried loop cost -7.3% on silicon
            warnings.warn(
                "carried-state loop cannot engage on this SHARDED dispatch "
                f"(grid {tuple(self.ga.types.shape)}, backend "
                f"{self.backend}, shards "
                f"{self.plan.mesh.devices.size}) — running the per-step "
                "loop; see adi3d.nl_carried_pre", stacklevel=2)
        return pre

    def update_boundaries(self) -> None:
        # reference also re-seeds next's BOUND/VALVE cells (Solver3D.cpp:28-34)
        self.cur = update_boundaries(self.cur, self.ga)
        self.next = update_boundaries(self.next, self.ga)

    def time_step(self, dt: float, num_global: int, num_local: int,
                  compute_error: bool = True) -> None:
        nxt, err = adi3d.adi_timestep_3d(
            self.cur, self.next, self.ga, jnp.float32(dt), num_global, num_local,
            self.pa, backend=self.backend, exact=self.exact,
            compute_error=compute_error, plan=self.plan,
            merge_ok=getattr(self, "merge_ok", (False, False, False)))
        if compute_error:
            self.last_err = float(err)
            if not (self.last_err <= adi3d.ERR_THRESHOLD):   # NaN-safe
                raise SolverError(f"Error is too big! {self.last_err}")
        # pointer swap (AdiSolver3D.cpp:387-390)
        self.next = self.cur
        self.cur = nxt

    def time_step_profiled(self, dt: float, num_global: int, num_local: int,
                           prof) -> None:
        """Per-direction profiled step (reference per-event table,
        Profiler.h:44-134): each direction-solve is its own dispatch timed
        into ``prof``.  Single-chip diagnostic mode."""
        if self.plan is not None:
            raise SolverError("profiled mode is single-chip (run without "
                              "shards)")
        nxt, err = adi3d.adi_timestep_3d_profiled(
            self.cur, self.next, self.ga, jnp.float32(dt), num_global,
            num_local, self.pa, prof, backend=self.backend,
            exact=self.exact,
            merge_ok=getattr(self, "merge_ok", (False, False, False)))
        self.last_err = err
        if not (self.last_err <= adi3d.ERR_THRESHOLD):   # NaN-safe
            raise SolverError(f"Error is too big! {self.last_err}")
        self.next = self.cur
        self.cur = nxt

    def get_layer(self, outdimx: int, outdimy: int, outdimz: int):
        """Reference Solver3D::GetLayer outputs the ``next`` layer, which after
        the cur/next swap holds the PRE-step state (Solver3D.cpp:21-25 +
        AdiSolver3D.cpp:387-390) — an off-by-one we reproduce.

        Deliberate deviation: the reference's Clear(OUT -> MISSING_VALUE)
        mutates the swap buffer persistently, so whether a later divergence
        check reads 99999-poisoned OUT corners depends on buffer parity (it
        happens to always land on the clean buffer for the shipped cases).
        We apply the MISSING clear only to the output copy — identical files,
        and the error metric always sees clean fields.
        """
        state, ga = self.next, self.ga
        pad = getattr(self, "_pad_x", 0)
        keep = getattr(self, "_x_keep", None)
        if pad:
            state = type(state)(*(f[:-pad] for f in state))
            ga = ga._replace(types=ga.types[:-pad])
        elif keep is not None:
            # balanced padding: drop the inserted inert planes (gather)
            state = type(state)(*(f[keep] for f in state))
            ga = ga._replace(types=ga.types[keep])
        out = get_layer(state, ga, outdimx, outdimy, outdimz)
        import jax
        if jax.process_count() > 1:
            # gather to every host (reference FilterToArrays MPI path,
            # TimeLayer3D.h:819-924); callers gate file writes to rank 0
            from jax.experimental import multihost_utils
            out = tuple(multihost_utils.process_allgather(o) for o in out)
        return out


class ExplicitSolver3D(AdiSolver3D):
    name = "Explicit"

    def time_step(self, dt: float, num_global: int, num_local: int,
                  compute_error: bool = True) -> None:
        nxt, err = explicit3d.explicit_timestep_3d(
            self.cur, self.next, self.ga, jnp.float32(dt), num_global,
            num_local, self.pa, compute_error=compute_error)
        if compute_error:
            self.last_err = float(err)
            if not (self.last_err <= adi3d.ERR_THRESHOLD):
                raise SolverError(f"Error is too big! {self.last_err}")
        self.next = self.cur
        self.cur = nxt


class StableSolver3D(AdiSolver3D):
    name = "Stable"

    def time_step(self, dt: float, num_global: int, num_local: int,
                  compute_error: bool = True) -> None:
        nxt, err = stable3d.stable_timestep_3d(
            self.cur, self.next, self.ga, jnp.float32(dt), num_global,
            num_local, self.pa, compute_error=compute_error)
        if compute_error:
            self.last_err = float(err)
            if not (self.last_err <= adi3d.ERR_THRESHOLD):
                raise SolverError(f"Error is too big! {self.last_err}")
        self.next = self.cur
        self.cur = nxt


def make_solver_3d(name: str, backend: str = "auto", exact: bool = True):
    return {"ADI": AdiSolver3D, "Explicit": ExplicitSolver3D,
            "Stable": StableSolver3D}[name](backend=backend, exact=exact)
