"""FluidSolver2D command-line driver.

Usage (mirrors reference src/FluidSolver2D/FluidSolver2D.cpp:22-159):
    fluidsolver2d <proj_file>
    fluidsolver2d <input> <output> <config> [flags]
    fluidsolver2d <input> <field> <output> <config> [flags]

Flags: ``align`` (32-align grid dims), ``CSV`` (profiler CSV),
``backend scan|pallas`` (tridiagonal backend), ``quiet``.
"""
from __future__ import annotations

import sys

from .core.config import Config
from .core.params import FluidParams
from .core.scene2d import Scene2D
from .geom.raster2d import Grid2D
from .io import writers
from .io.project import find_file, load_project
from .models.solver2d import make_solver
from .utils.profiler import Profiler
from .utils.timer import CpuTimer, print_time_step_info


def run_case(input_path: str, field_path: str, output_path: str, config_path: str,
             align: bool = False, csv: bool = False, backend: str = "auto",
             quiet: bool = False, max_steps: int | None = None,
             collect_errs: bool = False, checkpoint: str | None = None,
             resume: str | None = None):
    cfg = Config.load(config_path)
    params = FluidParams.physical(cfg.viscosity, cfg.density, cfg.R_specific,
                                  cfg.k, cfg.cv)

    scene = Scene2D.load(input_path, field_path, dx=cfg.dx, dy=cfg.dy, align=align)
    grid = Grid2D(scene, start_T=cfg.baseT, bc_noslip=cfg.bc_noslip,
                  bc_strength=cfg.bc_strength)
    if not quiet:
        print("dx,dy,dimx,dimy,bc_noslip")
        print(f"{cfg.dx:f},{cfg.dy:f},{grid.dimx},{grid.dimy},{int(cfg.bc_noslip)}")
    grid.prepare_frame(0, 0.0)

    solver = make_solver(cfg.solver, backend=backend)
    solver.init(grid, params)

    frames = scene.num_frames()
    length = scene.cycle_length()
    dt = length / (frames * cfg.time_steps)
    finaltime = length * cfg.cycles
    if not quiet:
        print(f"dt = {dt:f}")

    t_resume = 0.0
    if resume:
        from .io.checkpoint import load_checkpoint
        step0, t_resume, fields = load_checkpoint(resume)
        solver.set_layer(fields["u"], fields["v"], fields["T"])
        if "nu" in fields:
            import jax.numpy as jnp
            from .models.common2d import State2D
            solver.next = State2D(u=jnp.asarray(fields["nu"]),
                                  v=jnp.asarray(fields["nv"]),
                                  T=jnp.asarray(fields["nT"]))
        else:
            solver.next = solver.cur
        if not quiet:
            print(f"Resuming from step {step0}, t={t_resume:f}")

    # the reference writes the CDL header unconditionally, even in MultiVox
    # mode (FluidSolver2D.cpp:88)
    writers.output_netcdf_header_2d(output_path, grid.scene.bbox_min,
                                    grid.scene.bbox_max,
                                    dt * cfg.out_time_steps, finaltime,
                                    cfg.outdimx, cfg.outdimy)
    cur_out = output_path

    def _sync_fetch():
        # scalar round-trip: the only reliable device sync through the
        # remote axon tunnel (see utils/profiler.py)
        import jax.numpy as jnp
        float(jnp.sum(solver.cur.u))

    prof = Profiler(sync_fetch=_sync_fetch)
    timer = CpuTimer()
    timer.start()

    errs = []
    lastframe = -1
    currentcycle = 0
    t = dt
    i = 0
    nsteps = 0
    while t_resume and t <= t_resume + dt * 0.5:
        # fast-forward the frame/output bookkeeping to the resume point
        currentframe = scene.frame_at(t)
        if currentframe != lastframe:
            if currentframe == 0:
                currentcycle += 1
            lastframe = currentframe
            i = 0
        t += dt
        i += 1
    while t < finaltime:
        currentframe = scene.frame_at(t)
        layer_time = scene.layer_time(t)

        if currentframe != lastframe:
            if currentframe == 0:
                currentcycle += 1
                if cfg.out_fmt == "MultiVox":
                    # reference suffixes every cycle incl. the first
                    # (FluidSolver2D.cpp:106-114: currentcycle > 0)
                    stem, dot, ext = output_path.rpartition(".")
                    cur_out = f"{stem}_{currentcycle}{dot}{ext}" if dot else \
                        f"{output_path}_{currentcycle}"
                    writers.output_multivox_header(
                        cur_out, grid.scene.bbox_min, grid.scene.bbox_max,
                        cfg.outdimx, cfg.outdimy)
            if cfg.out_fmt == "MultiVox":
                writers.output_multivox_frame_marker(cur_out, currentframe)
            lastframe = currentframe
            i = 0

        with prof.section("Prepare"):
            grid.prepare(t)
            solver.refresh_grid()
        with prof.section("UpdateBoundaries"):
            solver.update_boundaries()
        with prof.section("TimeStep"):
            solver.time_step(dt, cfg.num_global, cfg.num_local)
        with prof.section("SetGridBoundaries"):
            solver.set_grid_boundaries()
        if collect_errs:
            errs.append(solver.last_err)

        timer.stop()
        if not quiet:
            print(f"\rerr = {solver.last_err:.4f},", end="")
            print_time_step_info(currentframe, i, t, finaltime, timer.elapsed_sec())

        if i % cfg.out_time_steps == 0:
            dur = min(dt * cfg.out_time_steps, layer_time)
            with prof.section("Output"):
                u, v, T = solver.get_layer(cfg.outdimx, cfg.outdimy)
                if cfg.out_fmt == "MultiVox":
                    writers.output_multivox(cur_out, u, v, dur)
                else:
                    finish = (i + cfg.out_time_steps >= cfg.time_steps
                              and currentframe == frames - 1
                              and currentcycle == cfg.cycles)
                    writers.output_netcdf_2d_u(output_path, u, finish)

        if checkpoint and i % cfg.out_time_steps == 0:
            import numpy as np
            from .io.checkpoint import save_checkpoint, save_last_layer_txt
            save_checkpoint(checkpoint, nsteps, t,
                            u=np.asarray(solver.cur.u), v=np.asarray(solver.cur.v),
                            T=np.asarray(solver.cur.T),
                            nu=np.asarray(solver.next.u), nv=np.asarray(solver.next.v),
                            nT=np.asarray(solver.next.T))
            save_last_layer_txt(checkpoint + ".lastlayer.txt", currentframe,
                                np.asarray(solver.cur.u), np.asarray(solver.cur.v),
                                np.asarray(solver.cur.T))
        t += dt
        i += 1
        nsteps += 1
        if max_steps is not None and nsteps >= max_steps:
            break

    if not quiet:
        print()
        print(prof.report(csv=csv))
    return solver, errs


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    flags = {"align": False, "CSV": False, "quiet": False}
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
        elif argv[i] in ("checkpoint", "resume") and i + 1 < len(argv):
            extras[argv[i]] = argv[i + 1]
            i += 1
        else:
            rest.append(argv[i])
        i += 1

    if len(rest) == 1:
        input_path, field_path, output_path, config_path = load_project(rest[0])
    elif len(rest) >= 4:
        input_path = find_file(rest[0])
        field_path = find_file(rest[1])
        output_path = rest[2]
        config_path = find_file(rest[3])
    elif len(rest) == 3:
        input_path = find_file(rest[0])
        field_path = ""
        output_path = rest[1]
        config_path = find_file(rest[2])
    else:
        print(__doc__)
        return 2

    run_case(input_path, field_path, output_path, config_path,
             align=flags["align"], csv=flags["CSV"], backend=backend,
             quiet=flags["quiet"], checkpoint=extras.get("checkpoint"),
             resume=extras.get("resume"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
