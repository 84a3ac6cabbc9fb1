"""Silicon A/B for the inert-dual elision (round-4 verdict item 1).

The 256^3 extruded-box bench case has all-Dirichlet dual endpoints on its
Y lines; before round 4 they forced the Y direction onto the per-iteration
two-pass fallback and disabled the stacked-carry step entirely (187.5
ms/step measured r3).  grid_arrays now elides the inert pass-B stitch
(models/common3d.py), making the grid dual-free and the whole step run the
stacked pair-kernel path.  This A/B runs BOTH ga variants interleaved in
one process on the same case: checksums must match bitwise (Dirichlet
BC0/BC1 rows are identical), the timing delta is the verdict's ~2.5x.

Run on the TPU:  python scripts/probe_dual_elision.py [--steps 10] [--reps 2]
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
          f"ng={args.ng} nl={args.nl} fused_nl, device={jax.devices()[0]}")

    gas = {"elided": grid_arrays(grid),
           "full": grid_arrays(grid, elide_inert_duals=False)}
    assert gas["full"].cls_b[1] is not None, "case lost its Y duals"
    assert all(c is None for c in gas["elided"].cls_b)
    is_in = np.asarray(grid.types) == NodeType.IN
    merge_ok = tuple(bool(((np.asarray(gas["elided"].cls_a[ax]) == INTERIOR)
                           == is_in).all()) for ax in range(3))
    for name, ga in gas.items():
        rep = adi3d.dispatch_report((grid.dimx, grid.dimy, grid.dimz), ga,
                                    "fused_nl", args.nl, merge_ok)
        print(f"dispatch[{name}]: {rep}")
    cur = update_boundaries(init_state(grid), gas["elided"])
    p = FluidParams.normalized(cfg.Re, cfg.Pr, cfg.lam)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(grid.cycle_len / cfg.time_steps)

    def step(state, nxt, ga):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, args.ng, args.nl,
                                       pa, backend="fused_nl", exact=False,
                                       compute_error=False,
                                       merge_ok=merge_ok)
        return new, state

    sums = {}
    results = {name: [] for name in gas}
    for rep_i in range(args.reps):
        for name, ga in gas.items():
            state, nxt = step(cur, cur, ga)
            state, nxt = step(state, nxt, ga)
            s = float(jnp.sum(state.u))
            if rep_i == 0:
                sums[name] = s
                print(f"warm {name}: checksum {s:.6f}")
            t0 = time.time()
            for _ in range(args.steps):
                state, nxt = step(state, nxt, ga)
            float(jnp.sum(state.u))
            wall = time.time() - t0
            ms = wall / args.steps * 1e3
            cups = cells * args.steps / wall
            results[name].append((ms, cups))
            print(f"rep{rep_i} {name}: {ms:8.1f} ms/step  {cups:.3e} "
                  "cell-upd/s")
    print(f"checksum |elided - full| = "
          f"{abs(sums['elided'] - sums['full']):.2e}")
    print("\nsummary (best rep):")
    for name in gas:
        ms, cups = min(results[name])
        print(f"  {name}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")


if __name__ == "__main__":
    main()
