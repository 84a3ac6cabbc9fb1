"""Trajectory parity against the C reference (the fidelity oracle).

These tests run the reference binaries built by refbuild/prepare.sh (CPU
path, cuda/netcdf stubbed with raw full-precision dumps) and diff our
solver's trajectories record by record.  Skipped when the harness has not
been prepared.
"""
import os
import subprocess

import numpy as np
import pytest

REFBUILD = os.path.join(os.path.dirname(__file__), "..", "refbuild")
DBG = os.path.join(REFBUILD, "FluidSolver3D_dbg")

pytestmark = pytest.mark.slow

needs_ref = pytest.mark.skipif(not os.path.exists(DBG),
                               reason="refbuild/prepare.sh not run")


def run_reference_3d(data: str, base: str, case: str, timeout: int = 600):
    out = os.path.join(REFBUILD, "out")
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(out):
        if f.startswith(base + "_res.nc."):
            os.remove(os.path.join(out, f))
    env = dict(os.environ, ASAN_OPTIONS="halt_on_error=0:log_path=asan_parity")
    subprocess.run([DBG, os.path.join(REFBUILD, "data", data), base,
                    os.path.join(REFBUILD, "cases", case)],
                   cwd=out, env=env, capture_output=True, timeout=timeout)
    for f in os.listdir(out):
        if f.startswith("asan_parity"):
            os.remove(os.path.join(out, f))
    return out


def ref_records(out_dir: str, base: str, var: str, shape):
    return np.fromfile(os.path.join(out_dir, f"{base}_res.nc.{var}.f64")).reshape(
        (-1,) + shape)


@needs_ref
def test_boxpipe_3d_trajectory(tmp_path):
    from cmcfs_tpu.cli3d import run_case
    from cmcfs_tpu.io.netcdf3 import NetCDF3Reader

    out = run_reference_3d("box_pipe_2D_data.txt", "bp", "box_pipe_3d_out1.txt")
    run_case(os.path.join(REFBUILD, "data", "box_pipe_2D_data.txt"),
             str(tmp_path / "bp"),
             os.path.join(REFBUILD, "cases", "box_pipe_3d_out1.txt"),
             backend="scan", quiet=True)
    r = NetCDF3Reader(str(tmp_path / "bp_res.nc"))
    for var in "uvwT":
        ref = ref_records(out, "bp", var, (54, 54, 52))
        ours = r.read(var)
        assert len(ours) >= len(ref)
        for rec in range(len(ref)):
            f = ref[rec]
            o = ours[rec]
            real = f < 9e4
            assert (real == (o < 9e4)).all(), (var, rec, "mask")
            scale = max(np.abs(f[real]).max(), 1e-30)
            rel = np.abs(o - f)[real].max() / scale
            assert rel < 5e-6, (var, rec, rel)


@needs_ref
def test_tetra_grid_and_first_record(tmp_path):
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid, run_case
    from cmcfs_tpu.io.netcdf3 import NetCDF3Reader

    cfg = Config.load(os.path.join(REFBUILD, "cases", "tetra.txt"))
    grid = build_grid(cfg, os.path.join(REFBUILD, "data", "tetra_data.txt"))
    assert (grid.dimx, grid.dimy, grid.dimz) == (105, 53, 53)
    assert grid.fluid_volume()[0] == 13811

    out = run_reference_3d("tetra_data.txt", "tt", "tetra.txt")
    run_case(os.path.join(REFBUILD, "data", "tetra_data.txt"),
             str(tmp_path / "tt"), os.path.join(REFBUILD, "cases", "tetra.txt"),
             backend="scan", quiet=True)
    r = NetCDF3Reader(str(tmp_path / "tt_res.nc"))
    ref = ref_records(out, "tt", "u", (100, 100, 100))[0]
    ours = r.read("u")[0]
    np.testing.assert_array_equal(ours < 9e4, ref < 9e4)
    np.testing.assert_allclose(ours[ref < 9e4], ref[ref < 9e4], atol=1e-7)


@needs_ref
def test_white_sea_grid_and_errs(tmp_path):
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid, run_case
    from cmcfs_tpu.io.netcdf3 import NetCDF3Reader

    cfg = Config.load(os.path.join(REFBUILD, "cases", "white_sea.txt"))
    grid = build_grid(cfg, os.path.join(REFBUILD, "data", "white_sea_data.nc"))
    assert (grid.dimx, grid.dimy, grid.dimz) == (73, 62, 61)
    assert grid.fluid_volume()[0] == 9599

    out = run_reference_3d("white_sea_data.nc", "ws", "white_sea.txt")
    solver, errs = run_case(os.path.join(REFBUILD, "data", "white_sea_data.nc"),
                            str(tmp_path / "ws"),
                            os.path.join(REFBUILD, "cases", "white_sea.txt"),
                            backend="scan", quiet=True, collect_errs=True)
    # reference printed errs: first 2.686e-5, final 1.9786e-4
    assert abs(errs[0] - 2.686e-5) < 2e-8
    assert abs(errs[-1] - 1.9786e-4) < 2e-7
    r = NetCDF3Reader(str(tmp_path / "ws_res.nc"))
    ref = ref_records(out, "ws", "T", (96, 64, 64))[0]
    ours = r.read("T")[0]
    np.testing.assert_array_equal(ours < 9e4, ref < 9e4)
    np.testing.assert_allclose(ours[ref < 9e4], ref[ref < 9e4], atol=1e-7)


@needs_ref
def test_non_uniform_pipe_grid_and_err(tmp_path):
    """Extrusion with depth_var paraboloid bottom (Grid3D.cpp:632-641)."""
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid, run_case

    case = os.path.join(REFBUILD, "cases", "non_uniform_pipe.txt")
    data = os.path.join(REFBUILD, "data", "non_uniform_pipe_2D_data.txt")
    cfg = Config.load(case)
    grid = build_grid(cfg, data)
    assert (grid.dimx, grid.dimy, grid.dimz) == (53, 53, 52)
    assert grid.fluid_volume()[0] == 99959     # reference NODE_IN count

    _, errs = run_case(data, str(tmp_path / "nup"), case, backend="scan",
                       quiet=True, collect_errs=True, max_steps=1)
    assert abs(errs[0] - 3.432e-5) < 2e-8      # reference printed err


@needs_ref
def test_align_flag_matches_reference():
    """32-alignment of grid dims (AlignBy32, Geometry.h:564; align CLI flag).
    Reference with align: Grid = 64x64x64, NODE_IN = 115248."""
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid

    cfg = Config.load(os.path.join(REFBUILD, "cases", "box_pipe_3d.txt"))
    g = build_grid(cfg, os.path.join(REFBUILD, "data", "box_pipe_2D_data.txt"),
                   align=True)
    assert (g.dimx, g.dimy, g.dimz) == (64, 64, 64)
    assert g.fluid_volume()[0] == 115248
