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
        out, _ = p.communicate(timeout=600)
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
