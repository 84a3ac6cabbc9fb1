"""2D trajectory parity vs the C reference (CDL text output comparison)."""
import os
import re
import subprocess

import numpy as np
import pytest

REFBUILD = os.path.join(os.path.dirname(__file__), "..", "refbuild")
BIN = os.path.join(REFBUILD, "FluidSolver2D")

pytestmark = pytest.mark.slow

needs_ref = pytest.mark.skipif(not os.path.exists(BIN),
                               reason="refbuild/prepare.sh not run")


def parse_cdl_frames(path: str, outdimx: int, outdimy: int):
    """Extract the appended u-value frames from the CDL text stream."""
    with open(path) as f:
        txt = f.read()
    body = txt.split("u = \n", 1)[1]
    vals = [float(v) for v in re.findall(r"-?\d+\.\d+", body)]
    per = outdimx * outdimy
    n = len(vals) // per
    return np.asarray(vals[: n * per]).reshape(n, outdimx, outdimy)


@needs_ref
def test_boxpipe_2d_adi_output(tmp_path):
    from cmcfs_tpu.cli2d import run_case

    ref_out = str(tmp_path / "ref.nc")
    subprocess.run([BIN, os.path.join(REFBUILD, "data", "box_pipe_data.txt"),
                    ref_out, os.path.join(REFBUILD, "cases", "box_pipe_adi.txt")],
                   capture_output=True, timeout=600, check=True)

    our_out = str(tmp_path / "ours.nc")
    run_case(os.path.join(REFBUILD, "data", "box_pipe_data.txt"), "",
             our_out, os.path.join(REFBUILD, "cases", "box_pipe_adi.txt"),
             backend="scan", quiet=True)

    ref = parse_cdl_frames(ref_out, 50, 50)
    ours = parse_cdl_frames(our_out, 50, 50)
    assert ref.shape == ours.shape and len(ref) >= 5
    # XLA contracts mul+add into FMA (the C build does not), so trajectories
    # diverge at the 1-ulp level and the valve jet amplifies it ~linearly
    # (PARITY.md item 8).  Gate the growth: early records near print
    # precision, later ones bounded.
    np.testing.assert_allclose(ours[1], ref[1], atol=1.5e-3)
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    assert (np.abs(ours - ref) > 1.1e-3).mean() < 0.05
