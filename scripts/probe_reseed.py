"""Silicon A/B for the carried-loop boundary-seed elision
(adi3d.NL_CARRIED_NOSEED, VERDICT r4 #7 / roadmap 3b).

The carried step's per-step re-seed (op = where(is_bv, cur, prev)) is a
full-grid XLA pass (read curZ + prevZ + the bv mask, write opZ) whose
output only the step's first Z pair kernel consumes — the last piece of
per-step XLA glue left in the carried loop.  Channels whose bc has no
FREE cell on the bv set hold step-invariant bv values, so their where()
is a bitwise no-op: those channels ELIDE, and the rest (the bench box
case: only T — bc_temp is FREE on the walls) update in place on the
donated prevZ buffer (tests/test_carried.py::
test_carried_seed_elision_bitwise_and_refusal).  Both arms run
interleaved in one process on the bench case; checksums must be BITWISE
equal (same kernels, bit-identical operands).

Run on the TPU:  python scripts/probe_reseed.py [--steps 10] [--reps 3]
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
    ap.add_argument("--reps", type=int, default=3)
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
    pre = adi3d.nl_carried_pre(ga, args.backend, args.nl, merge_ok)
    assert pre is not None, "carried mode does not engage on this case"
    assert pre["seed_vars"] != (0, 1, 2, 3), (
        "no channel is seed-elidable on this case — the A/B would time "
        "identical programs")
    print(f"seed_vars={pre['seed_vars']} (re-seeded channels; the rest "
          "elide)")
    cur = update_boundaries(init_state(grid), ga)
    p = FluidParams.normalized(cfg.Re, cfg.Pr, cfg.lam)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(grid.cycle_len / cfg.time_steps)

    def run(n, elide):
        curZ, prevZ = adi3d.nl_carried_begin(cur, cur)
        for _ in range(2):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                         args.ng, args.nl, exact=False,
                                         assume_seeded=elide)
            curZ, prevZ = nxtZ, curZ
        float(jnp.sum(adi3d.nl_carried_end(curZ).u))
        t0 = time.time()
        for _ in range(n):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                         args.ng, args.nl, exact=False,
                                         assume_seeded=elide)
            curZ, prevZ = nxtZ, curZ
        s = float(jnp.sum(adi3d.nl_carried_end(curZ).u))
        return time.time() - t0, s

    arms = {"where": False, "elide": True}
    sums = {}
    results = {name: [] for name in arms}
    for rep_i in range(args.reps):
        for name, elide in arms.items():
            wall, s = run(args.steps, elide)
            if rep_i == 0:
                sums[name] = s
                print(f"warm {name}: checksum {s:.6f}")
            ms = wall / args.steps * 1e3
            cups = cells * args.steps / wall
            results[name].append((ms, cups))
            print(f"rep{rep_i} {name}: {ms:8.1f} ms/step  {cups:.3e} "
                  "cell-upd/s")
    delta = abs(sums["elide"] - sums["where"])
    print(f"checksum |elide - where| = {delta:.2e}")
    assert delta == 0.0, "elision must be bitwise on the bench case"
    print("\nsummary (best rep):")
    for name in arms:
        ms, cups = min(results[name])
        print(f"  {name}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")


if __name__ == "__main__":
    main()
