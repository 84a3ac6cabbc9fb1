"""Benchmark: 3D ADI solver throughput on the shared extruded-box case.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cell-updates/sec/chip", "vs_baseline": R}

value        = grid_cells * physical_timesteps / wall_seconds on this chip
               (one physical timestep = num_global x 3 directions x num_local
               full implicit solves of all 4 variables, reference config 4x2).
vs_baseline  = value / (same quantity measured for the C reference's CPU
               build on the identical case; see BASELINE_MEASURED.json,
               produced by scripts/measure_reference.py).
"""
from __future__ import annotations

import argparse
import json
import os
import time

ROOT = os.path.dirname(os.path.abspath(__file__))


def run_bench_2d(n: int = 1024, steps: int = 50, backend: str = "auto",
                 num_global: int = 2, num_local: int = 1, exact: bool = False):
    """2D 1024^2 metric (BASELINE.md config 2): scan-of-steps inside one jit."""
    import jax
    import jax.numpy as jnp
    from cmcfs_tpu.geom.synthetic import lid_cavity_2d
    from cmcfs_tpu.models import adi2d
    from cmcfs_tpu.models.common2d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams

    g = lid_cavity_2d(n, n, dx=0.001)
    ga = grid_arrays(g)
    stream_ok = adi2d.stream_ok_2d(ga)
    cur = init_state(g)
    p = FluidParams.physical(0.05, 1000.0, 461.495, 0.6, 4200.0)
    pa = adi2d.ParamsArgs(*[jnp.float32(x) for x in
                            (p.v_T, p.v_vis, p.t_vis, p.t_phi, g.dx, g.dy, 1.0)])
    dt = jnp.float32(0.0005)

    def one(state, _):
        new, err, _it = adi2d.adi_timestep_2d(state, ga, dt, jnp.int32(num_global),
                                              num_local, pa, backend=backend,
                                              exact=exact, stream_ok=stream_ok)
        return new, err

    import functools

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run(state, k_steps):
        return jax.lax.scan(one, state, None, length=k_steps)

    state, errs = run(cur, steps)   # warm (compiles for this length)
    float(jnp.sum(state.u))
    t0 = time.time()
    state, errs = run(state, steps)
    checksum = float(jnp.sum(state.u))
    wall = time.time() - t0
    return dict(dims=(n, n), cells=n * n, ms_per_step=wall / steps * 1e3,
                cell_updates_per_sec=n * n * steps / wall, checksum=checksum,
                device=str(jax.devices()[0]), backend=backend,
                num_global=num_global, num_local=num_local)


def run_bench(size_dx: float = 0.00409, steps: int = 10, warmup: int = 2,
              backend: str = "fused_nl", num_global: int = 4, num_local: int = 2,
              exact: bool = False, carried: str = "auto"):
    import jax
    import jax.numpy as jnp
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.cli3d import build_grid
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state, update_boundaries
    from scripts.gen_box_case import gen

    case_dir = os.path.join(ROOT, "out", "benchcase")
    data, cfgp = gen(case_dir, dx=size_dx, time_steps=max(steps, 4),
                     num_global=num_global, num_local=num_local)
    cfg = Config.load(cfgp)
    grid = build_grid(cfg, data)
    cells = grid.dimx * grid.dimy * grid.dimz

    ga = grid_arrays(grid)
    import numpy as _np
    from cmcfs_tpu.core.types import NodeType as _NT
    from cmcfs_tpu.ops.masks import INTERIOR as _INT
    is_in = _np.asarray(grid.types) == _NT.IN
    merge_ok = tuple(bool(((_np.asarray(ga.cls_a[ax]) == _INT) == is_in).all())
                     for ax in range(3))
    cur = init_state(grid)
    cur = update_boundaries(cur, ga)
    p = FluidParams.normalized(cfg.Re, cfg.Pr, cfg.lam)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(grid.cycle_len / cfg.time_steps)

    import sys
    dispatch = adi3d.dispatch_report((grid.dimx, grid.dimy, grid.dimz), ga,
                                     backend, num_local, merge_ok)
    # carried-state loop: the simulation state stays stacked in the Z
    # kernel layout ACROSS steps (adi3d.nl_carried_*) — kills the per-step
    # stack/transpose/unstack glue; bitwise equal to the step-API loop
    # (tests/test_carried.py, bench_logs/probe_carried_r4.log)
    pre = (adi3d.nl_carried_pre(ga, backend, num_local, merge_ok)
           if carried != "off" else None)
    if carried == "on" and pre is None:
        raise SystemExit(f"--carried on: cannot engage (dispatch {dispatch})")
    print(f"dispatch: {dispatch} carried={pre is not None}"
          + (f" seed_vars={pre['seed_vars']}" if pre is not None else ""),
          file=sys.stderr, flush=True)

    if pre is not None:
        # assume_seeded: ``cur`` had update_boundaries applied above, so
        # no-FREE channels elide their per-step re-seed and the rest
        # update in place on the donated prevZ buffer (NL_CARRIED_NOSEED
        # — bitwise, tests/test_carried; −1.5% silicon,
        # bench_logs/probe_reseed_r5.log)
        curZ, prevZ = adi3d.nl_carried_begin(cur, cur)
        for _ in range(warmup):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                         num_global, num_local, exact=exact,
                                         assume_seeded=True)
            curZ, prevZ = nxtZ, curZ
        float(jnp.sum(adi3d.nl_carried_end(curZ)[0]))   # force
        t0 = time.time()
        for _ in range(steps):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                         num_global, num_local, exact=exact,
                                         assume_seeded=True)
            curZ, prevZ = nxtZ, curZ
        # forces execution + fetch (the one-time exit transpose is
        # deliberately inside the timed window)
        checksum = float(jnp.sum(adi3d.nl_carried_end(curZ)[0]))
        wall = time.time() - t0
    else:
        def step(state, nxt):
            new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, num_global,
                                           num_local, pa, backend=backend,
                                           exact=exact, compute_error=False,
                                           merge_ok=merge_ok)
            return new, state

        state, nxt = cur, cur
        for _ in range(warmup):
            state, nxt = step(state, nxt)
        float(jnp.sum(state[0]))          # force
        t0 = time.time()
        for _ in range(steps):
            state, nxt = step(state, nxt)
        checksum = float(jnp.sum(state[0]))  # forces execution + fetch
        wall = time.time() - t0
    ms_per_step = wall / steps * 1e3

    return dict(
        dims=(grid.dimx, grid.dimy, grid.dimz),
        cells=cells,
        ms_per_step=ms_per_step,
        cell_updates_per_sec=cells * steps / wall,
        checksum=checksum,
        device=str(jax.devices()[0]),
        backend=backend,
        num_global=num_global,
        num_local=num_local,
    )


def _await_tunnel():
    """The axon TPU tunnel goes Unavailable for stretches (a cold jax init
    then blocks ~25 min before raising).  When this run targets the TPU,
    ping-and-wait (bounded, env CMCFS_BENCH_WAIT_MIN, default 45 min) in
    short subprocesses BEFORE the in-process jax init, so a transient
    outage delays the benchmark instead of failing it."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    import sys
    sys.path.insert(0, ROOT)
    try:
        from scripts.tpu_wait import wait_for_tpu
    except ImportError:
        return
    budget = float(os.environ.get("CMCFS_BENCH_WAIT_MIN", "45")) * 60
    if not wait_for_tpu(interval=60.0, max_seconds=budget):
        print("warning: TPU tunnel still unavailable after "
              f"{budget / 60:.0f} min; attempting the run anyway",
              file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dx", type=float, default=0.00409)
    ap.add_argument("--backend", default="fused_nl")
    ap.add_argument("--case", default="3d",
                    choices=["3d", "3d384", "2d1024", "2d2048"])
    ap.add_argument("--carried", default="auto", choices=["auto", "on", "off"],
                    help="carried-state loop (adi3d.nl_carried_*): auto = "
                         "engage when the targeted stacked dispatch allows")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    _await_tunnel()

    if args.case == "2d1024":
        res = run_bench_2d(backend=args.backend)
    elif args.case == "2d2048":
        # 4x the 1024^2 cells: at 1024^2 the step is ~50% dispatch/tunnel
        # constant on this box (RESULTS.md r3) — the larger case shows the
        # kernel throughput.  Lines >288 ride the chunked long kernel.
        res = run_bench_2d(n=2048, backend=args.backend)
    elif args.case == "3d384":
        # ~384^3: above the VMEM line cap — exercises the chunked
        # long-line kernel path (ops/pallas_sweep_long.py)
        steps = min(args.steps, 5)
        if steps != args.steps:
            import sys
            print(f"note: 3d384 clamps --steps {args.steps} -> {steps} "
                  f"(~1 s/step on this chip)", file=sys.stderr)
        res = run_bench(size_dx=0.0027267, steps=steps,
                        backend=args.backend, carried=args.carried)
    else:
        res = run_bench(size_dx=args.dx, steps=args.steps,
                        backend=args.backend, carried=args.carried)

    baseline_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # the 2D reference baseline is measured at 1024^2; the C CPU
        # number is ~size-independent at these sizes, so 2d2048 reuses it
        key = ("cell_updates_per_sec_ref_cpu_2d"
               if args.case.startswith("2d")
               else "cell_updates_per_sec_ref_cpu")
        ref_cups = base.get(key)
        if ref_cups:
            vs = res["cell_updates_per_sec"] / ref_cups
    if vs is None:
        vs = res["cell_updates_per_sec"] / 5e9   # north-star fallback

    if args.verbose:
        print(json.dumps(res, indent=2, default=str))
    d = res["dims"]
    dims_s = "x".join(str(x) for x in d)
    print(json.dumps({
        "metric": f"{'3D' if len(d) == 3 else '2D'} ADI {dims_s} "
                  f"(ng={res['num_global']}, nl={res['num_local']}) throughput",
        "value": round(res["cell_updates_per_sec"], 1),
        "unit": "cell-updates/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
