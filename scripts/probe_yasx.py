"""A/B: Y-direction pair kernel as sweep_axis=1 (current) vs "Y_as_X" —
transpose (x,y) and run sweep_axis=0 so rows are major-dim contiguous.

The per-direction profiler shows Y/Z direction-pairs cost ~2x the X pair
(RESULTS.md round-3 event table); the suspect is the sweep_axis=1 row
access pattern (row p = ref[:, p, :] gathers one sublane from each of 8
tiles).  If an explicit XLA transpose + X-mode kernel beats the native
Y-mode kernel, the ADI step should route Y/Z through transposes (the
TPU analogue of the reference's Z_as_Y transpose option,
AdiSolver3D.cpp:324-332 — applied to BOTH non-major directions).

Run on the TPU:  python scripts/probe_yasx.py [--n 256] [--reps 3]
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
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    n = args.n

    import jax
    import jax.numpy as jnp
    import numpy as np
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.ops.pallas_sweep_nl import fused_sweep_nl

    grid = lid_cavity_3d(n, n, n)
    ga = grid_arrays(grid)
    st = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    dt = jnp.float32(0.01)
    h = grid.dy
    scal = jnp.stack([jnp.float32(x) for x in (
        p.v_vis / (h * h), p.t_vis / (h * h), 3.0 / 0.01,
        1.0 / (2.0 * h), p.v_T, p.t_phi,
        1.0 / (2.0 * grid.dx), 1.0 / (2.0 * grid.dz))])

    key = jax.random.PRNGKey(0)
    t4 = jax.random.normal(key, (4, n, n, n), jnp.float32) * 0.01
    r4 = t4 * 1.1
    o4 = t4 * 0.9
    cls, bcv, bct = ga.cls_a[1], ga.bc_vel, ga.bc_temp

    @jax.jit
    def run_y(t4, r4, o4):
        out, tn = fused_sweep_nl(t4, cls, bcv, bct, r4, o4, scal,
                                 sweep_axis=1, axis_var=1, exact=True)
        return out, tn

    swc = lambda m: jnp.swapaxes(m, 0, 1)
    clsT, bcvT, bctT = swc(cls), swc(bcv), swc(bct)

    @jax.jit
    def run_yasx(t4, r4, o4):
        sw = lambda t: jnp.swapaxes(t, 1, 2)
        out, tn = fused_sweep_nl(sw(t4), clsT, bcvT, bctT, sw(r4), sw(o4),
                                 scal, sweep_axis=0, axis_var=1, exact=True)
        return sw(out), sw(tn)

    def sync(x):
        return float(jnp.sum(x[0][0]).block_until_ready())

    # warmup + checksum agreement
    ry = run_y(t4, r4, o4)
    rx = run_yasx(t4, r4, o4)
    cy = np.asarray(jnp.stack([jnp.sum(jnp.abs(r)) for r in ry]))
    cx = np.asarray(jnp.stack([jnp.sum(jnp.abs(r)) for r in rx]))
    dmax = float(np.max(np.abs(np.asarray(ry[1] - rx[1]))))
    print(f"checksums Y={cy} YasX={cx} max|diff tn|={dmax:.3e}")

    for rep in range(args.reps):
        for name, fn in (("Y     ", run_y), ("Y_as_X", run_yasx)):
            sync(fn(t4, r4, o4))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                sync(fn(t4, r4, o4))
            el = (time.perf_counter() - t0) / args.iters * 1000
            print(f"rep{rep} {name}: {el:8.2f} ms/invocation")


if __name__ == "__main__":
    main()
