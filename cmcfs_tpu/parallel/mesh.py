"""Device mesh + sharding strategy for the 3D solver.

The reference scales by 1-D X-axis domain decomposition with hand-rolled
halo exchange (CUDA P2P + MPI, src/Common/GPUplan.cpp / PARAplan.cpp,
TimeLayer3D.h:158-335) and a pipelined distributed Thomas along X
(AdiSolver3D.cu:524-640).  TPU-native equivalent:

* one mesh axis ``"x"`` over the grid X dimension; fields are sharded
  P("x", None, None) — GSPMD turns stencil shifts into ppermute halo
  exchanges over ICI and reductions into psums,
* Y/Z sweeps are line-local (the batch axis is the sharded one),
* the X sweep (global along the sharded axis) is made local by resharding
  its row arrays to P(None, ..., "x") — an all_to_all over ICI.  This
  generalizes the reference's ``transpose`` optimization (SURVEY §2.4 item
  6); XLA inserts the collectives from the sharding constraints.

The ``MGPU_EMU`` analogue (GPUplan.h:10-15, fake 16 GPUs on one device) is a
host-platform mesh: run the identical SPMD program over N virtual CPU
devices (tests/conftest.py, __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Optional["ShardingPlan"] = None


class ShardingPlan:
    """Sharding specs for one mesh axis over the grid X dimension.

    ``nblockz`` > 1 switches the distributed X sweep from the all_to_all
    reshard to the Z-blocked wavefront pipeline (the reference's
    ``blocking nBlockZ``, AdiSolver3D.cu:642-881)."""

    def __init__(self, mesh: Mesh, axis: str = "x", nblockz: int = 0):
        self.mesh = mesh
        self.axis = axis
        self.nblockz = nblockz

    # hashable so jitted solver steps can take the plan as a static arg
    def __hash__(self):
        return hash((self.mesh, self.axis, self.nblockz))

    def __eq__(self, other):
        return (isinstance(other, ShardingPlan)
                and self.mesh == other.mesh and self.axis == other.axis
                and self.nblockz == other.nblockz)

    def state_spec(self) -> P:
        return P(self.axis, None, None)

    def state_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.state_spec())

    def shard_state(self, tree):
        sh = self.state_sharding()
        return jax.tree.map(lambda a: jax.device_put(a, sh) if hasattr(a, "ndim")
                            and a.ndim == 3 else a, tree)

    def shard_grid(self, ga):
        """Shard every (nx, ny, nz) grid array — types/bc/val fields and the
        per-axis line-class arrays incl. cls_b/take_b (the dual-endpoint
        pass-B path, reference MAX_SEGS_PER_ROW Grid3D.h:43)."""
        sh = self.state_sharding()

        def put(a):
            return None if a is None else jax.device_put(a, sh)

        return ga._replace(
            types=put(ga.types), bc_vel=put(ga.bc_vel), bc_temp=put(ga.bc_temp),
            val_u=put(ga.val_u), val_v=put(ga.val_v), val_w=put(ga.val_w),
            val_T=put(ga.val_T),
            cls_a=tuple(put(c) for c in ga.cls_a),
            cls_b=tuple(put(c) for c in ga.cls_b),
            take_b=tuple(put(c) for c in ga.take_b),
        )

    def constrain_rows(self, arr, sweep_axis: int):
        """Sharding constraint for stacked (vars, nx, ny, nz) row arrays.

        Y/Z sweeps stay X-sharded (batch-parallel); the X sweep resharding
        moves the split to Z so lines become device-local (all_to_all).
        """
        if sweep_axis == 0:
            spec = P(None, None, None, self.axis)
        else:
            spec = P(None, self.axis, None, None)
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(self.mesh, spec))

    def constrain_state(self, arr):
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(self.mesh, P(self.axis, None, None)))


def active_plan() -> Optional[ShardingPlan]:
    return _ACTIVE


@contextlib.contextmanager
def use_mesh(plan: Optional[ShardingPlan]):
    """Install the plan used by the solver's tracing-time hooks."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = plan
    try:
        yield
    finally:
        _ACTIVE = prev


def make_x_mesh(n_devices: Optional[int] = None, devices=None) -> ShardingPlan:
    if devices is not None:
        # an explicit device list is taken as-is: the caller's ordering is
        # the mesh ordering (canonicalizing it here would silently discard
        # an intentional placement)
        devs = list(devices)
    else:
        # DCN-aware placement: order devices so consecutive X shards are
        # process-local — neighbor halo ppermutes then cross hosts (DCN)
        # only at per-host block boundaries, everything else rides ICI.
        # (The reference nests its MPI split outside the per-node GPU split
        # for the same reason, PARAplan.cpp:62-90.)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested an {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible (reference errors likewise when GPU n "
                f"exceeds the machine, GPUplan.cpp:35-50)")
        devs = devs[:n_devices]
    import numpy as np
    mesh = Mesh(np.array(devs), ("x",))
    return ShardingPlan(mesh)
