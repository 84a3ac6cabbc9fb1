import numpy as np
import pytest

from cmcfs_tpu.core.config import Config
from cmcfs_tpu.core.params import FluidParams
from cmcfs_tpu.core.scene2d import Scene2D
from cmcfs_tpu.core.types import NodeType
from cmcfs_tpu.geom.raster2d import Grid2D
from cmcfs_tpu.models.solver2d import make_solver

DATA = "/root/reference/data"


def _setup(solver_name):
    cfg = Config.load(f"{DATA}/2D/box_pipe/box_pipe_config.txt")
    sc = Scene2D.load(f"{DATA}/2D/box_pipe/box_pipe_data.txt", dx=cfg.dx, dy=cfg.dy)
    grid = Grid2D(sc, start_T=cfg.baseT, bc_noslip=cfg.bc_noslip,
                  bc_strength=cfg.bc_strength)
    grid.prepare_frame(0, 0.0)
    params = FluidParams.physical(cfg.viscosity, cfg.density, cfg.R_specific,
                                  cfg.k, cfg.cv)
    s = make_solver(solver_name, backend="scan")
    s.init(grid, params)
    dt = sc.cycle_length() / (sc.num_frames() * cfg.time_steps)
    return cfg, grid, s, dt


@pytest.mark.parametrize("name", ["ADI", "Explicit", "Stable"])
def test_solver_runs_boxpipe(name):
    cfg, grid, s, dt = _setup(name)
    for step in range(3):
        t = dt * (step + 1)
        grid.prepare(t)
        s.refresh_grid()
        s.update_boundaries()
        s.time_step(dt, cfg.num_global, cfg.num_local)
        s.set_grid_boundaries()
        assert np.isfinite(s.last_err), name
        u = np.asarray(s.cur.u)
        assert np.isfinite(u).all(), name
    # the moving valve should inject momentum somewhere
    assert np.abs(np.asarray(s.cur.u)).max() > 0
    # OUT cells are cleared
    out = np.asarray(s.ga.types) == NodeType.OUT
    assert np.abs(np.asarray(s.cur.u)[out]).max() == 0


def test_adi_err_below_threshold():
    cfg, grid, s, dt = _setup("ADI")
    grid.prepare(dt)
    s.refresh_grid()
    s.update_boundaries()
    s.time_step(dt, cfg.num_global, cfg.num_local)
    assert s.last_err <= 0.1 * 10
    assert s.last_iters >= cfg.num_global
