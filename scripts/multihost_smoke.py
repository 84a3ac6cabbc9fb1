"""Per-process body of the 2-process multi-host smoke test.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
       python scripts/multihost_smoke.py <coordinator> <nprocs> <rank>

Each process contributes 4 virtual CPU devices; the global "x" mesh spans
all 8; one sharded ADI step runs and the divergence error is printed —
both processes must print the identical value (the reference's MPI_Reduce
+ Bcast invariant, TimeLayer3D.h:630-637).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags
                               + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cmcfs_tpu.parallel.multihost import init_distributed, global_mesh_info


def main():
    coordinator, nprocs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator, nprocs, rank)

    import jax
    import jax.numpy as jnp
    print(global_mesh_info(), flush=True)
    assert len(jax.devices()) == 4 * nprocs

    import __graft_entry__ as g
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    plan = make_x_mesh(len(jax.devices()))
    adi3d, ga, cur, pa = g._setup(32, 16, 16, "scan")
    # identical host data on every process -> device_put places each
    # process's shards locally (the reference loads the grid on every rank
    # too, Grid3D.cpp:488)
    cur = plan.shard_state(cur)
    ga = plan.shard_grid(ga)
    new, err = adi3d.adi_timestep_3d(cur, cur, ga, jnp.float32(0.01),
                                     num_global=2, num_local=1, pa=pa,
                                     backend="scan", exact=False,
                                     compute_error=True, plan=plan)
    jax.block_until_ready(new)
    print(f"RESULT rank={jax.process_index()} err={float(err):.9e}",
          flush=True)


if __name__ == "__main__":
    main()
