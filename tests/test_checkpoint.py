"""Checkpoint/resume: an interrupted run must reproduce the uninterrupted one."""
import os

import numpy as np
import pytest

REFBUILD = os.path.join(os.path.dirname(__file__), "..", "refbuild")

needs_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFBUILD, "data", "box_pipe_2D_data.txt")),
    reason="refbuild/prepare.sh not run")


@needs_data
def test_3d_resume_exact(tmp_path):
    from cmcfs_tpu.cli3d import run_case
    from cmcfs_tpu.io.netcdf3 import NetCDF3Reader

    data = os.path.join(REFBUILD, "data", "box_pipe_2D_data.txt")
    cfg = os.path.join(REFBUILD, "cases", "box_pipe_3d_out1.txt")

    run_case(data, str(tmp_path / "full"), cfg, backend="scan", quiet=True)

    ck = str(tmp_path / "ck")
    run_case(data, str(tmp_path / "part"), cfg, backend="scan", quiet=True,
             max_steps=4, checkpoint=ck)
    # resume to the SAME output base: must append to the existing records,
    # not truncate them (reference appends per record, IO.h:350-388)
    run_case(data, str(tmp_path / "part"), cfg, backend="scan", quiet=True,
             resume=ck + ".npz")

    full = NetCDF3Reader(str(tmp_path / "full_res.nc"))
    part = NetCDF3Reader(str(tmp_path / "part_res.nc"))
    np.testing.assert_array_equal(part.read("u"), full.read("u"))
    np.testing.assert_array_equal(part.read("T"), full.read("T"))
    # interrupted+resumed output is byte-identical to the uninterrupted run
    with open(tmp_path / "full_res.nc", "rb") as f1, \
         open(tmp_path / "part_res.nc", "rb") as f2:
        assert f1.read() == f2.read()


@needs_data
def test_3d_resume_orbax_exact(tmp_path):
    """Async orbax checkpoint tier: interrupt+resume must reproduce the
    uninterrupted run byte-for-byte, like the npz tier."""
    from cmcfs_tpu.cli3d import run_case

    data = os.path.join(REFBUILD, "data", "box_pipe_2D_data.txt")
    cfg = os.path.join(REFBUILD, "cases", "box_pipe_3d_out1.txt")

    run_case(data, str(tmp_path / "full"), cfg, backend="scan", quiet=True)
    ck = str(tmp_path / "ck_orbax")
    run_case(data, str(tmp_path / "part"), cfg, backend="scan", quiet=True,
             max_steps=4, checkpoint=ck, orbax=True)
    run_case(data, str(tmp_path / "part"), cfg, backend="scan", quiet=True,
             resume=ck, orbax=True)
    with open(tmp_path / "full_res.nc", "rb") as f1, \
         open(tmp_path / "part_res.nc", "rb") as f2:
        assert f1.read() == f2.read()


def test_legacy_text_layer_roundtrip(tmp_path):
    from cmcfs_tpu.io.checkpoint import save_last_layer_txt, load_last_layer_txt
    rng = np.random.default_rng(0)
    u = rng.normal(size=(6, 5)).astype(np.float32)
    v = rng.normal(size=(6, 5)).astype(np.float32)
    T = rng.normal(size=(6, 5)).astype(np.float32)
    p = str(tmp_path / "layer.txt")
    save_last_layer_txt(p, 3, u, v, T)
    frame, u2, v2, T2 = load_last_layer_txt(p, 6, 5, frames=10)
    assert frame == 3
    np.testing.assert_allclose(u2, u, atol=1e-6)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    # dimension mismatch -> None (reference returns 0)
    assert load_last_layer_txt(p, 7, 5, frames=10) is None


@needs_data
def test_2d_resume_exact(tmp_path):
    from cmcfs_tpu.cli2d import run_case
    from tests.test_parity_2d import parse_cdl_frames

    data = os.path.join(REFBUILD, "data", "box_pipe_data.txt")
    cfg = os.path.join(REFBUILD, "cases", "box_pipe_adi.txt")

    run_case(data, "", str(tmp_path / "full.nc"), cfg, backend="scan", quiet=True)
    ck = str(tmp_path / "ck")
    run_case(data, "", str(tmp_path / "p1.nc"), cfg, backend="scan", quiet=True,
             max_steps=20, checkpoint=ck)
    run_case(data, "", str(tmp_path / "p2.nc"), cfg, backend="scan", quiet=True,
             resume=ck + ".npz")

    full = parse_cdl_frames(str(tmp_path / "full.nc"), 50, 50)
    part = parse_cdl_frames(str(tmp_path / "p2.nc"), 50, 50)
    np.testing.assert_array_equal(part[-1], full[-1])
