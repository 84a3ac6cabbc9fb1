"""Roofline evidence for this chip: measured copy bandwidth vs the solver's
achieved per-direction-solve bandwidth.

Prints (a) raw HBM copy bandwidth (XLA copy of a 256^3 x4 block), (b) per
direction-solve wall time and implied GB/s for each backend, next to the
traffic model.  Run on the real TPU: `python scripts/roofline.py`.

The reference has no such tool; its Profiler prints per-phase times
(src/Common/Profiler.h:90-133) — this is the TPU-side equivalent evidence
for RESULTS.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))    # forces completion through the axon tunnel


def measure_copy_bw(n=256, reps=5):
    import jax
    import jax.numpy as jnp
    x = jnp.ones((4, n, n, n), jnp.float32)
    sync(x)
    copy = jax.jit(lambda a: a + 1.0)
    y = copy(x)
    sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = copy(y)
    sync(y)
    dtime = (time.time() - t0) / reps
    bytes_moved = 2 * x.size * 4          # read + write
    return bytes_moved / dtime / 1e9, dtime * 1e3


def measure_direction(backend: str, n=256, reps=10, axis=1):
    """One direction-solve (num_local=1) at n^3, aligned shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR

    grid = lid_cavity_3d(n, n, n)
    ga = grid_arrays(grid)
    cur = init_state(grid)
    is_in = np.asarray(grid.types) == NodeType.IN
    merge_ok = bool(((np.asarray(ga.cls_a[axis]) == INTERIOR) == is_in).all())
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)

    import functools

    @functools.partial(jax.jit, static_argnames=("be",))
    def one(rhs, temp, out, be):
        return adi3d._solve_direction_3d(axis, rhs, temp, out, ga, dt, 1,
                                         pa, be, False, None, merge_ok)

    temp, out = cur, cur
    t2, o2 = one(cur, temp, out, backend)
    sync(t2.u)
    t0 = time.time()
    temp, out = cur, cur
    for _ in range(reps):
        temp, out = one(cur, temp, out, backend)
    sync(temp.u)
    wall = (time.time() - t0) / reps
    return wall * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--backends", default="fused_dma,fused_full")
    ap.add_argument("--axes", default="0,1,2")
    args = ap.parse_args()

    bw, cms = measure_copy_bw(args.n)
    field_gb = 4 * args.n ** 3 * 4 / 1e9
    print(f"XLA elementwise copy of 4x{args.n}^3 f32: {cms:.2f} ms "
          f"=> {bw:.1f} GB/s effective")

    # traffic model (field-moves per direction-solve, num_local=1; see
    # docs/ROOFLINE.md for the per-slab derivation):
    model = {"fused_dma": 30 + 16, "fused_full": 18 + 8, "scan": 60,
             # fused_nl performs TWO local iterations per invocation
             # (30 moves per pair); at num_local=1 it equals fused_full
             "fused_nl": 18 + 8}
    for be in args.backends.split(","):
        for axis in [int(a) for a in args.axes.split(",")]:
            ms = measure_direction(be, args.n, axis=axis)
            moves = model.get(be, 0) / 4    # model counts 4-field moves
            gbs = moves * field_gb / (ms / 1e3)
            print(f"{be} axis={axis}: {ms:7.2f} ms/direction-solve "
                  f"(model {moves * field_gb:.2f} GB => {gbs:.0f} GB/s achieved)")


if __name__ == "__main__":
    main()
