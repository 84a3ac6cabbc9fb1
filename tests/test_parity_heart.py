"""Dynamic-geometry parity: the heart_US case (80-frame animation, per-step
grid rebuild).  The reference's ADI scheme blows up mid-contraction (~frame
43) at every tested dt — matching the blow-up location is the parity signal;
pre-blow-up trajectories must track."""
import os
import subprocess

import numpy as np
import pytest

REFBUILD = os.path.join(os.path.dirname(__file__), "..", "refbuild")
BIN = os.path.join(REFBUILD, "FluidSolver2D")

pytestmark = pytest.mark.slow
needs_ref = pytest.mark.skipif(not os.path.exists(BIN),
                               reason="refbuild/prepare.sh not run")

CASE = """dimension\t2D
viscosity \t0.05
density \t1000.0
bc_type\t\tNoSlip
grid_dx\t\t0.0007
grid_dy\t\t0.0007
cycles \t\t1
time_steps\t10
out_time_steps\t1
out_gridx\t50
out_gridy \t50
out_fmt\t\tNetCDF
solver\t\tADI
num_global \t2
num_local \t1
"""


@needs_ref
def test_heart_adi_dynamic_geometry(tmp_path):
    from cmcfs_tpu.cli2d import run_case
    from cmcfs_tpu.models.solver2d import SolverError
    from tests.test_parity_2d import parse_cdl_frames

    cfg = tmp_path / "heart_adi.txt"
    cfg.write_text(CASE)
    data = os.path.join(REFBUILD, "data", "heart_US_data.txt")

    subprocess.run([BIN, data, str(tmp_path / "ref.nc"), str(cfg)],
                   capture_output=True, timeout=600)
    ref = parse_cdl_frames(str(tmp_path / "ref.nc"), 50, 50)

    failed_at = None
    try:
        run_case(data, "", str(tmp_path / "ours.nc"), str(cfg),
                 backend="scan", quiet=True)
    except SolverError:
        pass
    ours = parse_cdl_frames(str(tmp_path / "ours.nc"), 50, 50)
    # both implementations must fail at the same contraction phase
    assert abs(len(ours) - len(ref)) <= 3, (len(ours), len(ref))
    # trajectories track until the instability amplifies the fp noise
    for frame, tol in ((50, 5e-3), (200, 1.5e-2), (350, 3e-2)):
        d = np.abs(ref[frame] - ours[frame]).max()
        assert d < tol, (frame, d)
