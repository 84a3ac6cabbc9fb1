"""Interleaved step-level backend A/B in ONE process.

This chip's throughput varies 2-4x run-to-run (shared axon tunnel), so
separate-process benchmarks are not comparable; this builds the case once
and alternates timed step batches between the backends.

Run on the TPU:
  python scripts/ab_step.py [--backends fused_full,fused_nl] [--dx 0.00409]
                            [--steps 10] [--reps 2] [--ng 4] [--nl 2]
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
    ap.add_argument("--backends", default="fused_full,fused_nl")
    ap.add_argument("--dx", type=float, default=0.00409)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ng", type=int, default=4)
    ap.add_argument("--nl", type=int, default=2)
    args = ap.parse_args()
    backends = args.backends.split(",")

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
          f"ng={args.ng} nl={args.nl}, device={jax.devices()[0]}")

    ga = grid_arrays(grid)
    is_in = np.asarray(grid.types) == NodeType.IN
    merge_ok = tuple(bool(((np.asarray(ga.cls_a[ax]) == INTERIOR)
                           == is_in).all()) for ax in range(3))
    cur = update_boundaries(init_state(grid), ga)
    p = FluidParams.normalized(cfg.Re, cfg.Pr, cfg.lam)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(grid.cycle_len / cfg.time_steps)

    # engagement telemetry: print each backend's static dispatch so the
    # log records which paths actually ran (round-3 verdict item 3)
    for be in backends:
        print(f"dispatch[{be}]: "
              f"{adi3d.dispatch_report(cur.u.shape, ga, be, args.nl, merge_ok)}")

    def step(state, nxt, be):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, args.ng, args.nl,
                                       pa, backend=be, exact=False,
                                       compute_error=False,
                                       merge_ok=merge_ok)
        return new, state

    # warm both backends (compile) + correctness cross-check
    sums = {}
    for be in backends:
        s, nx = step(cur, cur, be)
        s, nx = step(s, nx, be)
        sums[be] = float(jnp.sum(s.u))
        print(f"warm {be}: checksum {sums[be]:.6f}")
    keys = list(sums)
    for be in keys[1:]:
        d = abs(sums[be] - sums[keys[0]])
        print(f"  checksum |{be} - {keys[0]}| = {d:.2e}")

    results = {be: [] for be in backends}
    for rep in range(args.reps):
        for be in backends:
            state, nxt = cur, cur
            state, nxt = step(state, nxt, be)       # settle
            float(jnp.sum(state.u))
            t0 = time.time()
            for _ in range(args.steps):
                state, nxt = step(state, nxt, be)
            float(jnp.sum(state.u))
            wall = time.time() - t0
            ms = wall / args.steps * 1e3
            cups = cells * args.steps / wall
            results[be].append((ms, cups))
            print(f"rep{rep} {be}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")

    print("\nsummary (best rep):")
    for be in backends:
        ms, cups = min(results[be])
        print(f"  {be}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")


if __name__ == "__main__":
    main()
