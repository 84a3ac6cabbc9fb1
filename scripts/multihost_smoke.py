"""Per-process body of the 2-process multi-host smoke test.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=D \
       python scripts/multihost_smoke.py <coordinator> <nprocs> <rank> [mode]

Each process contributes D virtual CPU devices (default 4; the spawning
test sets the flag); the global "x" mesh spans all of them; one sharded
ADI step runs and the divergence error is printed — every process must
print the identical value (the reference's MPI_Reduce + Bcast invariant,
TimeLayer3D.h:630-637).

``mode``: "default" (fused_full vs scan, nl=1), "nl" (fused_nl vs scan at
num_local=2 — the nl-pair kernel's ppermute halo pre-exchange crosses
PROCESS boundaries), "long" (fused_full vs scan on a 320-long Y sweep —
the chunked long-line kernel runs per shard, the 512-class multi-chip
configuration).
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
    mode = sys.argv[4] if len(sys.argv) > 4 else "default"
    init_distributed(coordinator, nprocs, rank)

    import re
    import jax
    import jax.numpy as jnp
    print(global_mesh_info(), flush=True)
    m = re.search(r"host_platform_device_count=(\d+)",
                  os.environ.get("XLA_FLAGS", ""))
    dpp = int(m.group(1)) if m else 4
    assert len(jax.devices()) == dpp * nprocs

    import __graft_entry__ as g
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    shapes = {"default": (32, 16, 16), "nl": (32, 24, 16),
              "long": (16, 320, 16)}
    backends = {"default": ("fused_full", "scan"),
                "nl": ("fused_nl", "scan"),
                "long": ("fused_full", "scan")}[mode]
    num_local = 2 if mode == "nl" else 1

    plan = make_x_mesh(len(jax.devices()))
    adi3d, ga, cur, pa = g._setup(*shapes[mode], "scan")
    # merge_ok must come from the unsharded grid (host numpy); sharded
    # multihost arrays are not fully addressable per process
    merge_ok = g._merge_ok(ga)
    # identical host data on every process -> device_put places each
    # process's shards locally (the reference loads the grid on every rank
    # too, Grid3D.cpp:488)
    if mode == "nl":
        # the nl smoke must exercise the SHARDED STACKED-CARRY step (the
        # production multi-chip path): whole-step kernel-layout stacks,
        # uniform j-halo shard_map wrapper, cross-process all_to_alls
        assert adi3d.dispatch_report(cur.u.shape, ga, "fused_nl",
                                     num_local, merge_ok, plan)["stacked"], \
            "nl smoke fixture no longer routes through the stacked step"
    cur = plan.shard_state(cur)
    ga = plan.shard_grid(ga)
    errs = {}
    # the production fused path: {jax.distributed x shard_map x Pallas}
    # — the Y/Z stream kernels run per shard, the X sweep reshards through
    # the fused_dma kernel across processes
    for backend in backends:
        new, err = adi3d.adi_timestep_3d(cur, cur, ga, jnp.float32(0.01),
                                         num_global=2, num_local=num_local,
                                         pa=pa,
                                         backend=backend, exact=False,
                                         compute_error=True, plan=plan,
                                         merge_ok=merge_ok)
        jax.block_until_ready(new)
        errs[backend] = float(err)
    assert abs(errs[backends[0]] - errs[backends[1]]) < 1e-6, errs
    print(f"RESULT rank={jax.process_index()} err={errs[backends[0]]:.9e}",
          flush=True)


if __name__ == "__main__":
    main()
