"""Shared in-step A/B runner for adi3d module-flag experiments.

Both flag probes (scripts/probe_nl_xmode.py, scripts/probe_nl_stacked.py)
measure the same thing — the full fused_nl bench step with one trace-time
module flag flipped — so the harness (case generation, merge_ok, the
step, the interleaved rep loop, checksum cross-check) lives here once.
adi_timestep_3d's jit cache does not key on module flags: the cache is
cleared at each flip (XLA's compilation cache keeps both HLOs, so
re-tracing is cheap after the first rep).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)


def run_flag_ab(flag_attr: str, modes, description: str):
    """``modes``: [(name, flag_value), ...] — measured interleaved.

    Accepts the common CLI (--dx --steps --reps --ng --nl --bf16).
    """
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--dx", type=float, default=0.00409)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ng", type=int, default=4)
    ap.add_argument("--nl", type=int, default=2)
    ap.add_argument("--bf16", action="store_true")
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
    backend = "fused_bf16" if args.bf16 else "fused_nl"
    print(f"grid {grid.dimx}x{grid.dimy}x{grid.dimz} ({cells/1e6:.1f}M), "
          f"ng={args.ng} nl={args.nl} {backend} [{flag_attr}], "
          f"device={jax.devices()[0]}")

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

    def step(state, nxt):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, args.ng, args.nl,
                                       pa, backend=backend, exact=False,
                                       compute_error=False,
                                       merge_ok=merge_ok)
        return new, state

    # Engagement telemetry (round-3 verdict: two silicon A/Bs silently
    # measured fallback-vs-fallback): print each arm's static dispatch and
    # REFUSE to run when the two arms compile to the same program.
    reports = {}
    for name, flag in modes:
        saved = getattr(adi3d, flag_attr)
        setattr(adi3d, flag_attr, flag)
        reports[name] = adi3d.dispatch_report(cur.u.shape, ga, backend,
                                              args.nl, merge_ok)
        setattr(adi3d, flag_attr, saved)
        print(f"dispatch[{name}]: {reports[name]}")
    if reports[modes[0][0]] == reports[modes[1][0]]:
        raise SystemExit(
            f"A/B arms dispatch identically on this case — {flag_attr} "
            "does not engage here; pick a case where it does "
            "(see dispatch lines above)")

    sums = {}
    results = {name: [] for name, _ in modes}
    for rep in range(args.reps):
        for name, flag in modes:
            adi3d.adi_timestep_3d.clear_cache()
            setattr(adi3d, flag_attr, flag)
            state, nxt = step(cur, cur)             # compile + settle
            state, nxt = step(state, nxt)
            s = float(jnp.sum(state.u))
            if rep == 0:
                sums[name] = s
                print(f"warm {name}: checksum {s:.6f}")
            t0 = time.time()
            for _ in range(args.steps):
                state, nxt = step(state, nxt)
            float(jnp.sum(state.u))
            wall = time.time() - t0
            ms = wall / args.steps * 1e3
            cups = cells * args.steps / wall
            results[name].append((ms, cups))
            print(f"rep{rep} {name}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")
    n0, n1 = modes[0][0], modes[1][0]
    print(f"checksum |{n1} - {n0}| = {abs(sums[n1] - sums[n0]):.2e}")
    print("\nsummary (best rep):")
    for name, _ in modes:
        ms, cups = min(results[name])
        print(f"  {name}: {ms:8.1f} ms/step  {cups:.3e} cell-upd/s")
