"""FluidSolver3D command-line driver.

Usage (mirrors reference src/FluidSolver3D/FluidSolver3D.cpp:26-51):
    fluidsolver3d <input> <output_base> <config> [flags]

Flags: ``align``, ``CSV``, ``backend scan|pallas|fused...``, ``quiet``,
``dump_grid`` (BMP slice stack of the mask, like the reference's
OutputImage — off by default to keep runs lean), ``profile``
(per-direction event table — the reference's PROFILE_ENABLE mode with
CopyLayer/SolveSegments_X|Y|Z/MergeLayer/EvalDivError events),
``carried`` (carried-state loop: the state stays stacked in the Z
kernel layout across steps, −7.3%/step on silicon — FIELDS bitwise vs
the per-step loop; the divergence metric matches to reduction-order
tolerance (~1e-5 rel — it is a full-grid f32 sum fused differently);
single-chip ADI only; falls back to the per-step loop when the
dispatch refuses).
Multi-accelerator flags (reference FluidSolver3D.cpp:26-51 grammar):
``GPU [n]`` / ``shards N`` — an N-device "x" mesh (cmcfs_tpu.parallel)
with GSPMD halo exchange and the resharded X sweep; ``blocking [nBlockZ]``
— Z-blocked wavefront pipelined X sweep (parallel/pipeline.py);
``hosts N [rank R] [coordinator HOST:PORT]`` — multi-host bring-up via
jax.distributed (parallel/multihost.py), run one process per host.
"""
from __future__ import annotations

import sys

from .core.config import Config
from .core.params import FluidParams
from .core.scene2d import Scene2D
from .core.scene3d import Scene3D, Bathymetry
from .geom.raster2d import Grid2D
from .geom.grid3d import Grid3D
from .io import writers
from .io.project import find_file
from .models.solver3d import make_solver_3d
from .utils.profiler import Profiler
from .utils.timer import CpuTimer, print_time_step_info


BF16_STEP_WARN_THRESHOLD = 200


def bf16_horizon_warning(backend: str, total_steps: int) -> str | None:
    """Guardrail for the non-parity bf16 storage mode: returns a warning for
    trajectories long enough for the per-step rounding to accumulate
    (measured ~19% of max|u| by step 100 on a developing flow — RESULTS.md
    precision-sensitivity study), else None."""
    if (backend not in ("fused_bf16", "fused_pcr_bf16")
            or total_steps <= BF16_STEP_WARN_THRESHOLD):
        return None
    return (f"WARNING: backend {backend} over {total_steps} steps: bf16 "
            f"storage drift accumulates (~19% of max|u| by step 100 on a "
            f"developing flow, RESULTS.md); this mode is for bounded-horizon/"
            f"visualization runs — use fused_full for long trajectories")


def _is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def build_grid(cfg: Config, input_path: str, align: bool = False) -> Grid3D:
    if cfg.in_fmt == "Shape3D":
        scene = Scene3D.load(input_path, cfg.dx, cfg.dy, cfg.dz, align=align)
        grid = Grid3D.from_scene3d(scene, cfg.dx, cfg.dy, cfg.dz, cfg.baseT)
        grid.prepare_shape3d(0.0)
        grid.bbox_min, grid.bbox_max = scene.bbox_min, scene.bbox_max
        grid.num_frames = scene.num_frames()
        grid.cycle_len = cfg.frame_time if cfg.frame_time > 0 else scene.cycle_length()
    elif cfg.in_fmt == "Shape2D":
        scene2 = Scene2D.load(input_path, dx=cfg.dx, dy=cfg.dy, align=align)
        g2 = Grid2D(scene2, start_T=cfg.baseT, bc_noslip=True, bc_strength=0.0)
        grid = Grid3D.from_extruded_2d(g2, cfg.depth, cfg.depth_var, cfg.dz,
                                       cfg.baseT, align=align)
        grid.prepare_extruded(0.0)
        import numpy as np
        grid.bbox_min = np.array([scene2.bbox_min[0], scene2.bbox_min[1],
                                  -cfg.depth], dtype=np.float32)
        grid.bbox_max = np.array([scene2.bbox_max[0], scene2.bbox_max[1], 0.0],
                                 dtype=np.float32)
        grid.num_frames = scene2.num_frames()
        grid.cycle_len = scene2.cycle_length()
    else:  # SeaNetCDF
        bathy = Bathymetry.load(input_path)
        grid = Grid3D.from_bathymetry(bathy, cfg.dx, cfg.dy, cfg.dz, cfg.baseT,
                                      cfg.bc_inV, cfg.bc_inT, align=align)
        grid.prepare_bathymetry(0.0)
        grid.num_frames = 1
        grid.cycle_len = cfg.frame_time
    return grid


def run_case(input_path: str, output_base: str, config_path: str,
             align: bool = False, csv: bool = False, backend: str = "auto",
             quiet: bool = False, dump_grid: bool = False,
             max_steps: int | None = None, collect_errs: bool = False,
             checkpoint: str | None = None, resume: str | None = None,
             shards: int = 1, nblockz: int = 0, balance: str | None = None,
             orbax: bool = False, profile: bool = False,
             carried: bool = False):
    cfg = Config.load(config_path)
    if cfg.use_normalized_params:
        params = FluidParams.normalized(cfg.Re, cfg.Pr, cfg.lam)
    else:
        params = FluidParams.physical(cfg.viscosity, cfg.density,
                                      cfg.R_specific, cfg.k, cfg.cv)

    grid = build_grid(cfg, input_path, align=align)
    n_in, volume = grid.fluid_volume()
    if not quiet:
        print(f"Grid = {grid.dimx} x {grid.dimy} x {grid.dimz}")
        print(f"NODE_IN points = {n_in} of total "
              f"{grid.dimx * grid.dimy * grid.dimz}, volume = {volume:f}")
    if dump_grid:
        from .io.image import mask_to_bmp_stack
        mask_to_bmp_stack(grid.types, output_base + "_grid_3d")

    solver = make_solver_3d(cfg.solver, backend=backend)
    solver.init(grid, params)
    if shards > 1:
        from .parallel.mesh import make_x_mesh
        solver.set_plan(make_x_mesh(shards), nblockz=nblockz, balance=balance)

    frames = grid.num_frames
    length = grid.cycle_len
    dt = length / (frames * cfg.time_steps)
    finaltime = length * cfg.cycles

    total_steps = int(round(finaltime / dt))
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)
    warn = bf16_horizon_warning(backend, total_steps)
    if warn and _is_main_process():
        print(warn, file=sys.stderr)

    import os
    depths = getattr(grid, "bathy", None)
    out_path = output_base + "_res.nc"
    # resuming must append to the existing output (reference appends records,
    # IO.h:350-388) — recreating it would leave records [0, out_layer) zeroed
    nc = writers.NetCDF3DOutput(
        out_path, grid.bbox_min, grid.bbox_max,
        dt * cfg.out_time_steps, finaltime, cfg.outdimx, cfg.outdimy,
        cfg.outdimz, cfg.out_vars, xy_degree_units=cfg.in_fmt == "SeaNetCDF",
        depths=None if depths is None else depths.depth,
        append=bool(resume) and os.path.exists(out_path))

    def _sync_fetch():
        # force a scalar round-trip: the only reliable device sync through
        # the remote axon tunnel (see utils/profiler.py docstring)
        import jax.numpy as jnp
        float(jnp.sum(solver.cur.u))

    if not quiet and _is_main_process() and solver.name == "ADI":
        # execution-path visibility, the reference's OutputSegmentsInfo
        # analogue (AdiSolver3D.cpp:270-284)
        rep = solver.dispatch_report(cfg.num_local)
        print(f"dispatch: backend={rep['backend']} dirs={rep['dirs']} "
              f"stacked={rep['stacked']} targeted={rep['targeted']}")

    prof = Profiler(sync_fetch=_sync_fetch)
    timer = CpuTimer()
    timer.start()

    errs = []
    out_layer = 0
    t = dt
    i = 0
    nsteps = 0
    _ck_pending = None
    if resume:
        import jax.numpy as jnp
        from .models.common3d import State3D
        if orbax:
            from .io.checkpoint import load_checkpoint_orbax
            template = {"u": solver.cur.u, "v": solver.cur.v,
                        "w": solver.cur.w, "T": solver.cur.T,
                        "nu": solver.next.u, "nv": solver.next.v,
                        "nw": solver.next.w, "nT": solver.next.T}
            step0, t0, fields = load_checkpoint_orbax(resume,
                                                      template=template)
        else:
            from .io.checkpoint import load_checkpoint
            step0, t0, fields = load_checkpoint(resume)
        solver.cur = State3D(*(jnp.asarray(fields[k]) for k in ("u", "v", "w", "T")))
        solver.next = State3D(*(jnp.asarray(fields[k])
                                for k in ("nu", "nv", "nw", "nT")))
        while t <= t0 + dt * 0.5:
            t += dt
            i += 1
            if (i - 1) % cfg.out_time_steps == 0:
                out_layer += 1
        if not quiet:
            print(f"Resuming from step {step0}, t={t0:f}")

    # carried-state loop (``carried`` flag): the simulation state stays
    # stacked in the Z kernel layout ACROSS steps (adi3d.nl_carried_*,
    # −7.3%/step on silicon, bench_logs/probe_carried_r4.log).  The
    # per-step UpdateBoundaries is done in-layout by the carried step
    # (reseed_bv=True re-imposes the grid's BOUND/VALVE values on both
    # layers, elementwise in L_Z) — FIELDS bitwise vs the per-step loop;
    # the divergence metric matches to reduction-order tolerance only
    # (tests/test_carried.py pins the full cli sequence).  State
    # materializes back to (cur, next) only at output/checkpoint/error
    # events.
    _cz = _cpre = None
    if carried and solver.name == "ADI" and not profile:
        _cpre = solver.carried_runner(cfg.num_local)
        if _cpre is None:
            if not quiet and _is_main_process():
                print("carried: cannot engage on this dispatch — "
                      "running the per-step loop", file=sys.stderr)
        else:
            from .models import adi3d
            solver.update_boundaries()
            _cz = adi3d.nl_carried_begin(solver.cur, solver.next,
                                         plan=solver.plan)

    while t < finaltime:
        compute_err = (i % 10 == 0) or (t + dt >= finaltime)
        if _cz is not None:
            import jax.numpy as jnp
            from .models import adi3d
            from .models.solver2d import SolverError
            from .ops import stencil
            with prof.section("TimeStep"):
                # assume_seeded: update_boundaries ran on both layers
                # before nl_carried_begin above, so on a no-FREE-bc grid
                # the per-step re-seed is elided (NL_CARRIED_NOSEED —
                # bitwise, tests/test_carried)
                nxtZ = adi3d.nl_carried_step(_cz[0], _cz[1], _cpre,
                                             jnp.float32(dt), solver.pa,
                                             cfg.num_global, cfg.num_local,
                                             exact=solver.exact,
                                             reseed_bv=True,
                                             assume_seeded=True)
                _cz = (nxtZ, _cz[0])
            if compute_err:
                cc = adi3d.nl_carried_end(_cz[0], plan=solver.plan)
                err = float(stencil.div_error_3d(
                    cc.u, cc.v, cc.w, solver.ga.types,
                    solver.pa.dx, solver.pa.dy, solver.pa.dz))
                solver.last_err = err
                if not (err <= adi3d.ERR_THRESHOLD):   # NaN-safe
                    raise SolverError(f"Error is too big! {err}")
        elif profile:
            with prof.section("UpdateBoundaries"):
                solver.update_boundaries()
            # per-direction event table (reference PROFILE_ENABLE mode,
            # Profiler.h:44-134): each direction-solve is its own dispatch
            solver.time_step_profiled(dt, cfg.num_global, cfg.num_local,
                                      prof)
        else:
            with prof.section("UpdateBoundaries"):
                solver.update_boundaries()
            with prof.section("TimeStep"):
                solver.time_step(dt, cfg.num_global, cfg.num_local,
                                 compute_err)
        if collect_errs:
            errs.append(solver.last_err)
        timer.stop()
        if not quiet:
            print(f"\rerr = {solver.last_err:.8f},", end="")
            print_time_step_info(0, i, t, finaltime, timer.elapsed_sec())

        if _cz is not None and i % cfg.out_time_steps == 0:
            # materialize (cur, next) for get_layer / checkpoint: next is
            # the PRE-step layer (the reference GetLayer off-by-one) WITH
            # this iteration's UpdateBoundaries applied — in the default
            # loop ub runs before the step and survives the pointer swap,
            # while the carried prevZ is the raw post-step layer (the
            # in-step reseed only touches jit temporaries)
            from .models import adi3d
            from .models.common3d import update_boundaries as _ub
            solver.cur = adi3d.nl_carried_end(_cz[0], plan=solver.plan)
            solver.next = _ub(adi3d.nl_carried_end(_cz[1], plan=solver.plan),
                              solver.ga)
        if i % cfg.out_time_steps == 0:
            with prof.section("Output"):
                u, v, w, T = solver.get_layer(cfg.outdimx, cfg.outdimy, cfg.outdimz)
                if _is_main_process():
                    # rank-0 gated writes (reference IO.h:457-459)
                    nc.write_layer(out_layer, u, v, w, T)
            out_layer += 1
        if checkpoint and i % cfg.out_time_steps == 0:
            if orbax:
                # async device snapshot (no blocking host gather)
                from .io.checkpoint import save_checkpoint_orbax
                if _ck_pending is not None:
                    _ck_pending.wait_until_finished()
                _ck_pending = save_checkpoint_orbax(
                    checkpoint, nsteps, t,
                    {"u": solver.cur.u, "v": solver.cur.v,
                     "w": solver.cur.w, "T": solver.cur.T,
                     "nu": solver.next.u, "nv": solver.next.v,
                     "nw": solver.next.w, "nT": solver.next.T})
            else:
                import numpy as np
                from .io.checkpoint import save_checkpoint
                save_checkpoint(checkpoint, nsteps, t,
                                u=np.asarray(solver.cur.u), v=np.asarray(solver.cur.v),
                                w=np.asarray(solver.cur.w), T=np.asarray(solver.cur.T),
                                nu=np.asarray(solver.next.u), nv=np.asarray(solver.next.v),
                                nw=np.asarray(solver.next.w), nT=np.asarray(solver.next.T))
        t += dt
        i += 1
        nsteps += 1
        if max_steps is not None and nsteps >= max_steps:
            break

    if _cz is not None:
        # leave the returned solver in canonical state regardless of
        # whether the final step coincided with an output event (next
        # gets the iteration's ub, as at output events above)
        from .models import adi3d
        from .models.common3d import update_boundaries as _ub
        solver.cur = adi3d.nl_carried_end(_cz[0], plan=solver.plan)
        solver.next = _ub(adi3d.nl_carried_end(_cz[1], plan=solver.plan),
                          solver.ga)
    if _ck_pending is not None:
        _ck_pending.wait_until_finished()
    if not quiet:
        print()
        print(prof.report(csv=csv))
    return solver, errs


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    flags = {"align": False, "CSV": False, "quiet": False, "dump_grid": False,
             "orbax": False, "profile": False, "carried": False}
    backend = "auto"
    extras = {}
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] in flags:
            flags[argv[i]] = True
        elif argv[i] == "backend" and i + 1 < len(argv):
            backend = argv[i + 1]
            i += 1
        elif argv[i] in ("checkpoint", "resume", "shards", "hosts", "rank",
                         "coordinator", "balance") and i + 1 < len(argv):
            extras[argv[i]] = argv[i + 1]
            i += 1
        elif argv[i] == "GPU":
            # reference grammar: GPU [n] (FluidSolver3D.cpp:26-41); n
            # accelerators ≙ an n-device mesh here
            if i + 1 < len(argv) and argv[i + 1].isdigit():
                extras.setdefault("shards", argv[i + 1])
                i += 1
        elif argv[i] == "blocking":
            # reference grammar: blocking [nBlockZ] (FluidSolver3D.cpp:43-51)
            if i + 1 < len(argv) and argv[i + 1].isdigit():
                extras["nblockz"] = argv[i + 1]
                i += 1
        elif argv[i] in ("transpose", "decompose"):
            pass  # layout is handled by XLA relayouts; decompose is vestigial
        else:
            rest.append(argv[i])
        i += 1
    if len(rest) < 3:
        print(__doc__)
        return 2
    if "hosts" in extras:
        # multi-host bring-up (PARAplan analogue): must run before the
        # first jax backend use; see cmcfs_tpu/parallel/multihost.py
        from .parallel.multihost import init_distributed, global_mesh_info
        init_distributed(extras.get("coordinator"),
                         int(extras["hosts"]),
                         int(extras["rank"]) if "rank" in extras else None)
        print(global_mesh_info())
    run_case(find_file(rest[0]), rest[1], find_file(rest[2]),
             align=flags["align"], csv=flags["CSV"], backend=backend,
             quiet=flags["quiet"], dump_grid=flags["dump_grid"],
             checkpoint=extras.get("checkpoint"), resume=extras.get("resume"),
             shards=int(extras.get("shards", 1)),
             nblockz=int(extras.get("nblockz", 0)),
             balance=extras.get("balance"), orbax=flags["orbax"],
             profile=flags["profile"], carried=flags["carried"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
