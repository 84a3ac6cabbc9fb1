"""Animated multi-frame 3D mesh parity (heart_us) + large-case coverage.

heart_us is the only shipped Shape3D case with real animation (46 frames
with per-vertex velocities, data/3D/large_tests/heart_us); the example
tetra case is a single frame, so the frame-interpolation path
(Prepare3D_Shape subframe blend, reference Grid3D.cpp:947-964 + 901-945)
was otherwise untested against real animated data.

The per-frame oracle is refbuild/grid3d_probe (built by prepare.sh): the
shipped FluidSolver3D main only ever calls Prepare(0) (the per-step
re-prepare is commented out, FluidSolver3D.cpp:237), so per-frame masks
need a driver that calls the reference Grid3D::Prepare(t) directly.

Gated: CMCFS_LONG=1 (the C binary runs the full 46-step cycle, ~10 min).
"""
import os
import subprocess

import numpy as np
import pytest

REFBUILD = os.path.join(os.path.dirname(__file__), "..", "refbuild")
PROBE = os.path.join(REFBUILD, "grid3d_probe")
DATA = os.path.join(REFBUILD, "data", "heart_us_3D_data.txt")
CASE = os.path.join(REFBUILD, "cases", "heart_us_3d.txt")

pytestmark = pytest.mark.skipif(
    os.environ.get("CMCFS_LONG") != "1",
    reason="long tier: set CMCFS_LONG=1 (builds/runs the C oracle, ~15 min)")

needs_ref = pytest.mark.skipif(
    not (os.path.exists(PROBE) and os.path.exists(DATA)),
    reason="refbuild/prepare.sh not run")

# spread across the 46-frame cycle (cycle length 46/75 s, Duration=1/75
# per frame hardcoded by the reference loader, Grid3D.cpp:415), incl. a
# mid-frame subframe blend and the degenerate t=0.1 (the interpolated
# mesh there floods to all-outside — reproduced exactly)
PROBE_TIMES = [0.0, 0.02, 0.1, 0.30667, 0.55]


@needs_ref
def test_heart_us_per_frame_grid_parity(tmp_path):
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid

    cfg = Config.load(CASE)
    grid = build_grid(cfg, DATA)
    assert (grid.dimx, grid.dimy, grid.dimz) == (120, 132, 113)
    assert grid.num_frames == 46

    base = str(tmp_path / "hu")
    r = subprocess.run([PROBE, DATA, str(cfg.dx), str(cfg.dy), str(cfg.dz),
                        str(cfg.baseT), base] + [str(t) for t in PROBE_TIMES],
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dims 120 132 113 frames 46" in r.stdout

    dims = (grid.dimx, grid.dimy, grid.dimz)
    for i, t in enumerate(PROBE_TIMES):
        grid.prepare_shape3d(t)
        ref_types = np.fromfile(f"{base}_{i}.types",
                                dtype=np.uint8).reshape(dims)
        np.testing.assert_array_equal(np.asarray(grid.types), ref_types,
                                      err_msg=f"mask t={t}")
        ref_vel = np.fromfile(f"{base}_{i}.vel",
                              dtype=np.float32).reshape(dims + (3,))
        # the reference's 3D rasterizer never writes the blended per-vertex
        # velocities into nodes (RasterPolygon/ProjectPointOnPolygon set
        # types only, Grid3D.cpp:690-788) — boundary velocity stays zero;
        # we reproduce that quirk bitwise (PARITY.md)
        np.testing.assert_array_equal(np.asarray(grid.vel), ref_vel,
                                      err_msg=f"vel t={t}")


@needs_ref
def test_heart_us_trajectory_first_records(tmp_path):
    from tests.test_parity_reference import run_reference_3d, ref_records
    from cmcfs_tpu.cli3d import run_case
    from cmcfs_tpu.io.netcdf3 import NetCDF3Reader

    out = run_reference_3d("heart_us_3D_data.txt", "hu", "heart_us_3d.txt",
                           timeout=3600)
    n_rec = 4
    run_case(DATA, str(tmp_path / "hu"), CASE, backend="scan", quiet=True,
             max_steps=n_rec * 2)
    r = NetCDF3Reader(str(tmp_path / "hu_res.nc"))
    for var in "uT":
        ref = ref_records(out, "hu", var, (104, 104, 104))
        ours = r.read(var)
        for rec in range(min(n_rec, len(ours), len(ref))):
            f, o = ref[rec], ours[rec]
            real = f < 9e4
            assert (real == (o < 9e4)).all(), (var, rec, "mask")
            scale = max(np.abs(f[real]).max(), 1e-30)
            rel = np.abs(o - f)[real].max() / scale
            assert rel < 5e-6, (var, rec, rel)


@needs_ref
def test_white_sea_large_grid_parity(tmp_path):
    """Full-size white_sea (large_tests config: 2x finer grid, 150x100x100
    out-grid) — grid build parity + first divergence error."""
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid, run_case

    case = os.path.join(REFBUILD, "cases", "white_sea_large.txt")
    data = os.path.join(REFBUILD, "data", "white_sea_data.nc")
    if not os.path.exists(case):
        pytest.skip("re-run refbuild/prepare.sh to stage white_sea_large")
    cfg = Config.load(case)
    grid = build_grid(cfg, data)

    dbg = os.path.join(REFBUILD, "FluidSolver3D_dbg")
    env = dict(os.environ, ASAN_OPTIONS="halt_on_error=0:log_path=asan_wsl")
    r = subprocess.run([dbg, data, str(tmp_path / "wsl"), case],
                       cwd=str(tmp_path), env=env, capture_output=True,
                       text=True, timeout=3600)
    import re as _re
    m = _re.search(r"Grid = (\d+) x (\d+) x (\d+)", r.stdout)
    assert m, r.stdout[-2000:]
    assert (grid.dimx, grid.dimy, grid.dimz) == tuple(int(g) for g in
                                                      m.groups())
    m = _re.search(r"NODE_IN points = (\d+)", r.stdout)
    assert m and grid.fluid_volume()[0] == int(m.group(1))
    errs_ref = [float(x) for x in _re.findall(r"err = ([0-9.e+-]+)",
                                              r.stdout)]

    _, errs = run_case(data, str(tmp_path / "wsl_ours"), case,
                       backend="scan", quiet=True, collect_errs=True,
                       max_steps=len(errs_ref) or 2)
    if errs_ref:
        assert abs(errs[0] - errs_ref[0]) < max(2e-7, 1e-3 * errs_ref[0])
