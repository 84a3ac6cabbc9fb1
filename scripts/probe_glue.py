"""Step-glue lower-bound probe (TPU).

Measures (interleaved, one process):
  (a) the real fused_nl step (bench configuration, compute_error=False);
  (b) a kernels-only chain: the same 12 pair-kernel invocations
      (ng x {Z,Y,X} in xmode = all sweep_axis=0) back-to-back inside one
      jit, each consuming the previous call's outputs IN KERNEL LAYOUT —
      no transposes, no mask re-permutes, no stack/unstack, no seeding.
      Semantically wrong (layouts never rotated), but every kernel sees
      identically-shaped cubic operands, so it is a valid TIMING lower
      bound for the step's kernel work.

(a) - (b) = everything XLA does between kernels (operand permutes for the
Y/Z xmode routing, next-layer seeding, State3D re-stacking) — the budget
any relayout optimization could recover (docs/ROOFLINE.md §2 residual).

Run: python scripts/probe_glue.py [--n 256] [--steps 10] [--reps 2]
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
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ng", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.ops.pallas_sweep_nl import fused_sweep_nl

    n = args.n
    adi3d_mod, ga, cur, pa = g._setup(n, n, n, "scan")
    merge_ok = g._merge_ok(ga)
    dt = jnp.float32(0.01)
    print(f"{n}^3 ng={args.ng} nl=2 device={jax.devices()[0]}")

    # ---- (a) the real step (both carry modes: per-direction round-trip
    # vs stacked-carry — CPU HLO shows identical transpose counts, so any
    # difference here is TPU layout-assignment copies)
    def real_step(state, nxt):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, args.ng, 2, pa,
                                       backend="fused_nl", exact=False,
                                       compute_error=False,
                                       merge_ok=merge_ok)
        return new, state

    # ---- (b) kernels-only chain: 12 sweep_axis=0 pair calls, chained
    scal = jnp.stack([pa.v_vis / (pa.dx * pa.dx), pa.t_vis / (pa.dx * pa.dx),
                      3.0 / dt, 1.0 / (2.0 * pa.dx), pa.v_T, pa.t_phi,
                      1.0 / (2.0 * pa.dy), 1.0 / (2.0 * pa.dz)])
    cls = ga.cls_a[0]

    def chain(t4, r4, o4, bcv, bct):
        for k in range(3 * args.ng):
            o4, t4 = fused_sweep_nl(t4, cls, bcv, bct, r4, o4, scal,
                                    sweep_axis=0, axis_var=0, exact=False,
                                    gmerge=(k % 3 == 2))
        return t4, o4

    chain_j = jax.jit(chain)
    t4 = jnp.stack(tuple(cur))
    r4 = t4 * 0.5
    o4 = t4 * 0.25

    def fetch(x):
        return float(jnp.sum(x[0] if isinstance(x, tuple) else x.u))

    # warm all three programs
    sums = {}
    for flag in (False, True):
        adi3d.NL_STACKED = flag
        adi3d.adi_timestep_3d.clear_cache()
        state, nxt = real_step(cur, cur)
        sums[flag] = fetch(state)
    tb, ob = chain_j(t4, r4, o4, ga.bc_vel, ga.bc_temp)
    fetch((tb,))
    print(f"checksum |stacked - perdir| = "
          f"{abs(sums[True] - sums[False]):.2e}")

    for rep in range(args.reps):
        ta = {}
        for flag in (False, True):
            adi3d.NL_STACKED = flag
            adi3d.adi_timestep_3d.clear_cache()
            state, nxt = real_step(cur, cur)   # retrace (XLA cache hit)
            fetch(state)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, nxt = real_step(state, nxt)
            fetch(state)
            ta[flag] = (time.perf_counter() - t0) / args.steps * 1e3

        t0 = time.perf_counter()
        tb, ob = t4, o4
        for _ in range(args.steps):
            tb, ob = chain_j(tb, r4, ob, ga.bc_vel, ga.bc_temp)
        fetch((tb,))
        tk = (time.perf_counter() - t0) / args.steps * 1e3

        for name, t in (("perdir ", ta[False]), ("stacked", ta[True])):
            print(f"rep {rep} {name}: {t:7.1f} ms | kernels-only {tk:.1f} ms "
                  f"| glue {t - tk:.1f} ms ({(t - tk) / t * 100:.1f}%)")


if __name__ == "__main__":
    main()
