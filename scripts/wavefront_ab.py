"""Measure the Z-blocked wavefront X sweep (`blocking nBlockZ`) against the
all_to_all reshard path on the virtual 8-device CPU mesh (the dryrun
environment; real-ICI behavior differs — this quantifies schedule/compute
overheads, which is what differs between the two strategies on-chip too:
the wavefront trades one all_to_all for nblockz pipelined ppermute rounds).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/wavefront_ab.py [--steps 3] [--dims 64 64 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

# sitecustomize registers the remote-TPU plugin at interpreter start, so
# env mutation in-process is too late — re-exec with the pinned CPU env
# (the same pattern as __graft_entry__.dryrun_multichip)
if os.environ.get("PALLAS_AXON_POOL_IPS") != "":
    import subprocess
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    raise SystemExit(subprocess.call([sys.executable] + sys.argv, env=env))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dims", type=int, nargs=3, default=(64, 64, 64))
    ap.add_argument("--nblockz", type=int, nargs="*", default=(0, 2, 4, 8))
    args = ap.parse_args()

    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.parallel.mesh import make_x_mesh, ShardingPlan

    grid = lid_cavity_3d(*args.dims)
    ga = grid_arrays(grid)
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)
    plan0 = make_x_mesh(8)
    cur_s = plan0.shard_state(cur)
    ga_s = plan0.shard_grid(ga)

    results = {}
    for nb in args.nblockz:
        plan = (plan0 if nb == 0
                else ShardingPlan(plan0.mesh, plan0.axis, nblockz=nb))
        state = cur_s
        state, _ = adi3d.adi_timestep_3d(state, state, ga_s, dt, 2, 2, pa,
                                         backend="scan", plan=plan)
        jax.block_until_ready(state.u)        # warm/compile
        t0 = time.time()
        for _ in range(args.steps):
            state, _ = adi3d.adi_timestep_3d(state, state, ga_s, dt, 2, 2,
                                             pa, backend="scan", plan=plan)
        jax.block_until_ready(state.u)
        ms = (time.time() - t0) / args.steps * 1e3
        results[nb] = ms
        label = "all_to_all" if nb == 0 else f"wavefront nblockz={nb}"
        print(f"{label:24s}: {ms:8.1f} ms/step "
              f"(checksum {float(jnp.sum(state.u)):.6f})")
    return results


if __name__ == "__main__":
    main()
