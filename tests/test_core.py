import numpy as np
import pytest

from cmcfs_tpu.core.config import Config, ConfigError
from cmcfs_tpu.core.params import FluidParams
from cmcfs_tpu.core.scene2d import Scene2D
from cmcfs_tpu.geom.raster2d import Grid2D
from cmcfs_tpu.core.types import NodeType

DATA = "/root/reference/data"


def test_config_2d_boxpipe():
    cfg = Config.load(f"{DATA}/2D/box_pipe/box_pipe_config.txt")
    assert cfg.problem_dim == "2D"
    assert cfg.in_fmt == "Shape2D"          # forced for 2D
    assert cfg.solver == "Stable"
    assert cfg.dx == pytest.approx(0.0007, rel=1e-6)
    # calc_subframes / out_subframes are NOT recognized keys -> defaults stay
    assert cfg.time_steps == 50
    assert cfg.out_time_steps == 10
    assert cfg.out_fmt == "NetCDF"
    assert not cfg.use_normalized_params


def test_config_3d_boxpipe_2d_input():
    cfg = Config.load(f"{DATA}/3D/example_tests/box_pipe/box_pipe_2D_config.txt")
    assert cfg.problem_dim == "3D"
    assert cfg.in_fmt == "Shape2D"
    assert cfg.use_normalized_params
    assert cfg.Re == pytest.approx(200.0)
    assert cfg.depth == pytest.approx(1.0)
    assert cfg.time_steps == 100
    assert cfg.out_time_steps == 10
    assert cfg.out_vars == ["u", "v", "w", "T"]
    assert cfg.solver == "ADI"
    assert cfg.num_global == 4 and cfg.num_local == 2


def test_config_missing_solver():
    with pytest.raises(ConfigError):
        Config.parse_tokens("dimension 2D grid_dx 0.1 grid_dy 0.1 out_fmt NetCDF".split())


def test_fluid_params():
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    assert p.v_T == 1.0
    assert p.v_vis == pytest.approx(1.0 / 200.0, rel=1e-6)
    assert p.t_vis == pytest.approx(1.0 / 144.0, rel=1e-6)
    assert p.t_phi == pytest.approx(0.4 / (1.4 * 200.0), rel=1e-6)
    q = FluidParams.physical(0.05, 1000.0, 461.495, 0.6, 4200.0)
    assert q.v_T == pytest.approx(461.495, rel=1e-6)
    assert q.v_vis == pytest.approx(5e-5, rel=1e-6)


def test_scene_load_boxpipe():
    sc = Scene2D.load(f"{DATA}/2D/box_pipe/box_pipe_data.txt",
                      dx=0.0007, dy=0.0007)
    assert sc.num_frames() == 1
    fr = sc.frames[0]
    assert len(fr.shapes) == 4
    assert fr.duration == pytest.approx(0.035)
    actives = [s.active for s in fr.shapes]
    assert actives == [False, True, False, True]
    # Motion velocity scaled by 0.001
    np.testing.assert_allclose(fr.shapes[1].velocities[0], [-0.1, 0.0], atol=1e-7)
    # grid dims: bbox 80x90 (mm->m) + 2% padding, /0.0007 + 1
    assert sc.dimx == 120 and sc.dimy == 135
    assert sc.is_static()


def test_grid2d_build_boxpipe():
    sc = Scene2D.load(f"{DATA}/2D/box_pipe/box_pipe_data.txt", dx=0.0007, dy=0.0007)
    g = Grid2D(sc, start_T=1.0, bc_noslip=True, bc_strength=0.5)
    g.prepare_frame(0, 0.0)
    t = g.cur_types
    n_in = (t == NodeType.IN).sum()
    n_bound = (t == NodeType.BOUND).sum()
    n_valve = (t == NodeType.VALVE).sum()
    n_out = (t == NodeType.OUT).sum()
    assert n_in > 0 and n_bound > 0 and n_valve > 0 and n_out > 0
    # domain border must be OUT (2% bbox padding)
    assert (t[0, :] == NodeType.OUT).all() and (t[-1, :] == NodeType.OUT).all()
    assert (t[:, 0] == NodeType.OUT).all() and (t[:, -1] == NodeType.OUT).all()
    # valve cells carry the motion velocities
    vmask = t == NodeType.VALVE
    assert np.abs(g.cur_vel[vmask]).max() > 0
    # box interior: majority IN within the box bbox
    assert n_in > n_out * 0.2


def test_scene_frame_timing():
    sc = Scene2D.load(f"{DATA}/2D/box_pipe/box_pipe_data.txt", dx=0.0007, dy=0.0007)
    assert sc.cycle_length() == pytest.approx(0.035)
    f, s = sc.frame_substep(0.0175)
    assert f == 0 and s == pytest.approx(0.5)
