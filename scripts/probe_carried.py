"""Silicon A/B for the carried-state loop (adi3d.nl_carried_*).

The step API (adi_timestep_3d) re-stacks State3D, transposes into the Z
kernel layout and unstacks back EVERY step — probe_glue's ~8 ms/step
residual above the kernels-only floor at 256^3.  The carried loop keeps
(curZ, prevZ) stacked @ L_Z across steps and the X direction's final
targeted pair kernel writes the next step's operand in-kernel, so the
per-step XLA glue is just the boundary re-seed.  Both arms run
interleaved in one process on the bench case; checksums must be bitwise
(the carried loop feeds the kernels bit-identical operands —
tests/test_carried.py).

The carried arm's timing INCLUDES the one-time nl_carried_end transpose
inside the timed window (it is where the final checksum forces
execution), matching bench.py's methodology.

Run on the TPU:  python scripts/probe_carried.py [--steps 10] [--reps 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.00409)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ng", type=int, default=4)
    ap.add_argument("--nl", type=int, default=2)
    ap.add_argument("--backend", default="fused_nl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.cli3d import build_grid
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import (grid_arrays, init_state,
                                           update_boundaries)
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from scripts.gen_box_case import gen

    case_dir = os.path.join(ROOT, "out", "abcase")
    data, cfgp = gen(case_dir, dx=args.dx, time_steps=max(args.steps, 4),
                     num_global=args.ng, num_local=args.nl)
    cfg = Config.load(cfgp)
    grid = build_grid(cfg, data)
    cells = grid.dimx * grid.dimy * grid.dimz
    print(f"grid {grid.dimx}x{grid.dimy}x{grid.dimz} ({cells/1e6:.1f}M), "
          f"ng={args.ng} nl={args.nl} {args.backend}, "
          f"device={jax.devices()[0]}")

    ga = grid_arrays(grid)
    is_in = np.asarray(grid.types) == NodeType.IN
    merge_ok = tuple(bool(((np.asarray(ga.cls_a[ax]) == INTERIOR)
                           == is_in).all()) for ax in range(3))
    rep = adi3d.dispatch_report((grid.dimx, grid.dimy, grid.dimz), ga,
                                args.backend, args.nl, merge_ok)
    print(f"dispatch: {rep}")
    pre = adi3d.nl_carried_pre(ga, args.backend, args.nl, merge_ok)
    assert pre is not None, (
        "carried mode does not engage on this case — the A/B would time "
        f"identical programs (dispatch: {rep})")
    cur = update_boundaries(init_state(grid), ga)
    p = FluidParams.normalized(cfg.Re, cfg.Pr, cfg.lam)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(grid.cycle_len / cfg.time_steps)

    def step(state, nxt):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, args.ng, args.nl,
                                       pa, backend=args.backend, exact=False,
                                       compute_error=False,
                                       merge_ok=merge_ok)
        return new, state

    def run_stepapi(n):
        state, nxt = step(cur, cur)
        state, nxt = step(state, nxt)
        float(jnp.sum(state.u))
        t0 = time.time()
        for _ in range(n):
            state, nxt = step(state, nxt)
        s = float(jnp.sum(state.u))
        return time.time() - t0, s

    def run_carried(n):
        curZ, prevZ = adi3d.nl_carried_begin(cur, cur)
        for _ in range(2):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                         args.ng, args.nl, exact=False)
            curZ, prevZ = nxtZ, curZ
        float(jnp.sum(adi3d.nl_carried_end(curZ).u))
        t0 = time.time()
        for _ in range(n):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                         args.ng, args.nl, exact=False)
            curZ, prevZ = nxtZ, curZ
        s = float(jnp.sum(adi3d.nl_carried_end(curZ).u))
        return time.time() - t0, s

    arms = {"stepapi": run_stepapi, "carried": run_carried}
    sums = {}
    results = {name: [] for name in arms}
    for rep_i in range(args.reps):
        for name, fn in arms.items():
            wall, s = fn(args.steps)
            if rep_i == 0:
                sums[name] = s
                print(f"warm {name}: checksum {s:.6f}")
            ms = wall / args.steps * 1e3
            cups = cells * args.steps / wall
            results[name].append((ms, cups))
            print(f"rep{rep_i} {name}: {ms:8.1f} ms/step  {cups:.3e} "
                  "cell-upd/s")
    print(f"checksum |carried - stepapi| = "
          f"{abs(sums['carried'] - sums['stepapi']):.2e}")
    print("\nsummary (best rep):")
    for name in arms:
        ms, cups = min(results[name])
        print(f"  {name}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")


if __name__ == "__main__":
    main()
