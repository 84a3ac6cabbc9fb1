"""Multi-host smoke: TWO real processes form one global mesh on CPU and run
a sharded ADI step (the PARAplan/MPI analogue, src/Common/PARAplan.cpp:13-126
— here jax.distributed over a coordinator, no transport code)."""
import os
import re
import socket
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
SCRIPT = os.path.join(ROOT, "scripts", "multihost_smoke.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
                 [sys.executable, SCRIPT, coord, "2", str(r)],
                 env=env, cwd=ROOT, stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, text=True)
             for r in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    errs = []
    for out in outs:
        m = re.search(r"RESULT rank=(\d) err=([0-9.e+-]+)", out)
        assert m, out[-4000:]
        errs.append(float(m.group(2)))
        assert "4 local / 8 global" in out
    # both processes must agree on the reduced divergence error
    assert errs[0] == errs[1] and errs[0] >= 0.0


def _run_mesh(nprocs: int, dpp: int, mode: str, timeout: int = 1800):
    # generous: ~400 s unloaded for the nl-pair case, but suite runs can
    # share the box with other jax processes (observed 2x+ slowdowns)
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={dpp}")
    procs = [subprocess.Popen(
                 [sys.executable, SCRIPT, coord, str(nprocs), str(r), mode],
                 env=env, cwd=ROOT, stdout=subprocess.PIPE,
                 stderr=subprocess.STDOUT, text=True)
             for r in range(nprocs)]
    errs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, out[-4000:]
        m = re.search(r"RESULT rank=(\d) err=([0-9.e+-]+)", out)
        assert m, out[-4000:]
        errs.append(float(m.group(2)))
        assert f"{dpp} local / {dpp * nprocs} global" in out
    assert len(set(errs)) == 1 and errs[0] >= 0.0


@pytest.mark.slow
def test_two_process_nl_pair():
    """{jax.distributed x shard_map x nl-pair kernel}: the halo
    pre-exchange ppermute crosses PROCESS boundaries (num_local=2,
    backend fused_nl vs scan)."""
    _run_mesh(2, 4, "nl")


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("CMCFS_LONG") != "1",
                    reason="set CMCFS_LONG=1 (4-process soak, ~10 min)")
def test_four_process_long_sweep():
    """Four real processes x 2 devices = one 8-way mesh running a
    320-long Y sweep: the chunked long-line kernel (pallas_sweep_long)
    runs per shard across process boundaries — the 512^3-class
    multi-host configuration (reference PARAplan nesting,
    src/Common/PARAplan.cpp:13-126)."""
    _run_mesh(4, 2, "long", timeout=1800)
