"""MultiVox legacy output parity (header/markers byte-identical, values
within the documented FMA drift)."""
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


@needs_ref
def test_multivox_output(tmp_path):
    from cmcfs_tpu.cli2d import run_case

    cfg = tmp_path / "mv.txt"
    base = open("/root/reference/data/2D/box_pipe/box_pipe_config.txt").read()
    cfg.write_text(base.replace("\r", "").replace("Stable", "ADI")
                   .replace("NetCDF", "MultiVox"))
    data = os.path.join(REFBUILD, "data", "box_pipe_data.txt")

    subprocess.run([BIN, data, str(tmp_path / "ref.txt"), str(cfg)],
                   capture_output=True, timeout=600, check=True)
    run_case(data, "", str(tmp_path / "ours.txt"), str(cfg),
             backend="scan", quiet=True)

    ref = open(tmp_path / "ref_1.txt").read().splitlines()
    ours = open(tmp_path / "ours_1.txt").read().splitlines()
    assert len(ref) == len(ours)
    assert ref[:2] == ours[:2]                       # header byte-identical
    assert [l for l in ref if l.startswith("Frame")] == \
           [l for l in ours if l.startswith("Frame")]
    mx = 0.0
    for x, y in zip(ref, ours):
        if x != y:
            vx = np.array([float(v) for v in re.findall(r"-?\d+\.?\d*", x)])
            vy = np.array([float(v) for v in re.findall(r"-?\d+\.?\d*", y)])
            assert len(vx) == len(vy)
            if len(vx):
                mx = max(mx, np.abs(vx - vy).max())
    assert mx < 0.1, mx     # x10-scaled velocities; FMA drift bound
