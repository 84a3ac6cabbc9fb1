"""Multi-host (multi-process) bring-up — the PARAplan analogue.

The reference layers MPI over its per-node GPU plan
(src/Common/PARAplan.cpp:13-126: rank/size init, 1-D X split across ranks,
pinned-buffer halo staging).  The TPU-native equivalent is
``jax.distributed``: every process calls :func:`init_distributed`, after
which ``jax.devices()`` returns the GLOBAL device list and the same 1-axis
"x" mesh (parallel/mesh.py) simply spans all hosts — GSPMD keeps inserting
the identical ppermute/psum collectives, routed over ICI within a slice and
DCN across slices by the runtime.  No transport code, no pinned buffers,
no rank-gated gather loops: the SPMD program is unchanged from single-host.

Bring-up recipe (one process per host; on TPU pods the runtime fills the
arguments in automatically and ``jax.distributed.initialize()`` suffices):

    # host 0                                  # host 1
    python -m cmcfs_tpu.cli3d ... \\          python -m cmcfs_tpu.cli3d ... \\
      hosts 2 rank 0 coordinator h0:9876       hosts 2 rank 1 coordinator h0:9876

Inputs are loaded identically on every process (same scene files — the
reference likewise loads the grid on every rank, Grid3D.cpp:488);
``jax.device_put`` with a global NamedSharding then places each host's
shard locally.  Output gathering to host 0 mirrors the reference's
FilterToArrays MPI path (TimeLayer3D.h:819-924) via
``jax.experimental.multihost_utils.process_allgather``.

Testable anywhere: tests/test_multihost.py runs TWO actual processes on
CPU (4 virtual devices each -> one 8-device global mesh) through a full
sharded ADI step — the multi-node analogue of the MGPU_EMU fake mesh.
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. MUST run before the first jax backend use
    (reference: MPI_Init before any plan setup, FluidSolver3D.cpp:63-70)."""
    import jax
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh_info() -> str:
    import jax
    return (f"process {jax.process_index()}/{jax.process_count()}: "
            f"{len(jax.local_devices())} local / {len(jax.devices())} global "
            f"devices")
