"""Debug harness: fused_sweep_nl (2 fused local iterations) vs two
fused_sweep_stream invocations on one direction.  CPU interpreter.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/debug_nl.py \
       [--axis 0] [--n 16 16 16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--axis", type=int, default=0)
    ap.add_argument("--n", type=int, nargs=3, default=[16, 16, 16])
    args = ap.parse_args()
    axis = args.axis

    import jax.numpy as jnp
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import State3D

    adi3d_m, ga, cur, pa = g._setup(*args.n, "scan")
    merge_ok = g._merge_ok(ga)
    print("merge_ok:", merge_ok)
    dt = jnp.float32(0.01)

    rhs = cur
    temp = cur
    out = State3D(*(jnp.zeros_like(f) for f in cur))

    # reference: two per-iteration stream-kernel local iterations
    t_ref, o_ref = temp, out
    for _ in range(2):
        t_ref, o_ref = adi3d._solve_stream_fused(axis, rhs, t_ref, o_ref,
                                                 ga, dt, pa, exact=True)

    t_nl, o_nl = adi3d._solve_nl_fused(axis, rhs, temp, out, ga, dt, pa,
                                       exact=True)

    names = "uvwT"
    for which, ref4, got4 in (("temp", t_ref, t_nl), ("out", o_ref, o_nl)):
        for vi in range(4):
            r = np.asarray(ref4[vi])
            o = np.asarray(got4[vi])
            bad = ~np.isclose(o, r, rtol=0, atol=5e-7)
            if bad.any():
                idx = np.argwhere(bad)
                print(f"{which}.{names[vi]}: {bad.sum()}/{bad.size} mismatch "
                      f"maxabs={np.abs(o - r).max():.3e}")
                print("  first bad idx:", idx[:5].tolist())
                lo = idx.min(axis=0)
                hi = idx.max(axis=0)
                print(f"  bad bbox: {lo.tolist()}..{hi.tolist()}")
            else:
                print(f"{which}.{names[vi]}: OK")


if __name__ == "__main__":
    main()
