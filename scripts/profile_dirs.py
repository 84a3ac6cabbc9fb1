"""Per-direction event table on the synthetic cavity (TPU).

Runs adi_timestep_3d_profiled (the reference's PROFILE_ENABLE event set)
for a few steps and prints the profiler table — the tool for attributing
the X/Y/Z direction-solve asymmetry before kernel tuning.

Usage: python scripts/profile_dirs.py [--n 256] [--steps 3] [--ng 4]
       [--nl 2] [--backend fused_nl]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--ng", type=int, default=4)
    ap.add_argument("--nl", type=int, default=2)
    ap.add_argument("--backend", default="fused_nl")
    ap.add_argument("--csv", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from cmcfs_tpu.utils.profiler import Profiler

    adi3d, ga, cur, pa = g._setup(args.n, args.n, args.n, "scan")
    merge_ok = g._merge_ok(ga)
    dt = jnp.float32(0.01)
    print(f"{args.n}^3 ng={args.ng} nl={args.nl} backend={args.backend} "
          f"device={jax.devices()[0]}")

    # warm (compile every section's dispatch)
    warm = Profiler(sync=False)
    nxt, _ = adi3d.adi_timestep_3d_profiled(cur, cur, ga, dt, args.ng,
                                            args.nl, pa, warm,
                                            backend=args.backend,
                                            merge_ok=merge_ok)
    prof = Profiler(sync=False)
    state, prev = nxt, cur
    for _ in range(args.steps):
        new, _ = adi3d.adi_timestep_3d_profiled(state, prev, ga, dt, args.ng,
                                                args.nl, pa, prof,
                                                backend=args.backend,
                                                merge_ok=merge_ok)
        state, prev = new, state

    # measure the per-section sync constant (each section ends with a
    # float(jnp.sum(u)) fetch; through the axon tunnel that round-trip
    # dominates short sections) on already-materialized data, and report
    # net-of-overhead times next to the raw ones
    import time
    float(jnp.sum(state.u))
    const = min(_timed_fetch(jnp, time, state.u) for _ in range(5))
    print(prof.report(csv=args.csv, overhead_ms=const * 1e3))


def _timed_fetch(jnp, time, arr):
    t0 = time.perf_counter()
    float(jnp.sum(arr))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
