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


def test_stable_sequential_projection_consistent():
    """The reference-exact sequential GS mode (stable2d._project_sequential)
    is verified against a verbatim NumPy emulation of the C loop order on
    one projection (small synthetic cavity keeps it fast).  Full-trajectory
    parity vs the actual C binary is tests/test_parity_stable.py."""
    import jax.numpy as jnp
    from cmcfs_tpu.geom.synthetic import lid_cavity_2d
    from cmcfs_tpu.models import stable2d
    from cmcfs_tpu.models.common2d import grid_arrays, init_state
    from cmcfs_tpu.models.solver2d import StableSolver2D
    from cmcfs_tpu.ops import stencil
    from cmcfs_tpu.core.types import NodeType

    grid = lid_cavity_2d(24, 20, dx=0.01, lid_velocity=0.4)
    params = FluidParams.normalized(150.0, 0.72, 1.4)
    s = StableSolver2D(backend="sequential")
    s.init(grid, params)
    dt = 0.01
    s.update_boundaries()
    s.time_step(dt, 2, 1)   # develop a nontrivial w field
    wu, wv = stable2d._advect_diffuse(s.cur, s.cur, s.pa, jnp.float32(dt))
    is_in = np.asarray(s.ga.types) == NodeType.IN
    wu = jnp.where(is_in, wu, s.cur.u)
    wv = jnp.where(is_in, wv, s.cur.v)
    su, sv = stable2d._poisson_project(wu, wv, s.ga, s.pa, mode="sequential")

    # NumPy emulation of the reference loop VERBATIM (StableSolver2D.cpp
    # :111-151: boundary cells then inner cells in lexicographic order,
    # double intermediates, f32 storage, raw |(new-old)/new| error chain)
    types = np.asarray(s.ga.types)
    dimx, dimy = types.shape
    bnd = [(i, j) for i in range(dimx) for j in range(dimy)
           if types[i, j] in (int(NodeType.BOUND), int(NodeType.VALVE))]
    inner = [(i, j) for i in range(dimx) for j in range(dimy)
             if types[i, j] == int(NodeType.IN)]
    dx2, dy2 = float(s.pa.dx) ** 2, float(s.pa.dy) ** 2
    rcp = 0.5 / (dx2 + dy2)
    wu_n, wv_n = np.asarray(wu), np.asarray(wv)
    div = np.zeros((dimx, dimy))
    for (i, j) in inner:
        div[i, j] = ((wu_n[(i + 1) % dimx, j] - wu_n[i - 1, j]) / (2 * float(s.pa.dx))
                     + (wv_n[i, (j + 1) % dimy] - wv_n[i, j - 1]) / (2 * float(s.pa.dy)))
    q = np.zeros((dimx, dimy), np.float32)
    IN = int(NodeType.IN)
    for _ in range(stable2d.MAX_POISSON_ITERS):
        err = 0.0
        for (i, j) in bnd + inner:
            if types[i, j] == IN:
                i0, i1 = q[i - 1, j], q[i + 1, j]
                j0, j1 = q[i, j - 1], q[i, j + 1]
            else:
                i0 = q[i - 1, j] if types[i - 1, j] == IN else q[i + 1, j]
                i1 = q[i + 1, j] if types[i + 1, j] == IN else q[i - 1, j]
                j0 = q[i, j - 1] if types[i, j - 1] == IN else q[i, j + 1]
                j1 = q[i, j + 1] if types[i, j + 1] == IN else q[i, j - 1]
            q_new = rcp * ((float(i0) + float(i1)) * dy2
                           + (float(j0) + float(j1)) * dx2
                           - div[i, j] * dx2 * dy2)
            with np.errstate(divide="ignore", invalid="ignore"):
                cur = abs((q_new - float(q[i, j])) / q_new)
            err = err if cur < err else cur     # C std::max(cur, err)
            q[i, j] = np.float32(q_new)
        if not err >= stable2d.POISSON_ERR_THRESHOLD:
            break
    pu = wu_n - np.float32((np.roll(q, -1, 0) - np.roll(q, 1, 0)) / (2 * float(s.pa.dx)))
    pv = wv_n - np.float32((np.roll(q, -1, 1) - np.roll(q, 1, 1)) / (2 * float(s.pa.dy)))

    # the q-solve error enters u and v in ABSOLUTE terms (grad q), so both
    # components are bounded against the combined velocity scale
    scale = max(np.abs(pu[is_in]).max(), np.abs(pv[is_in]).max(), 1e-9)
    for ours, ref in ((su, pu), (sv, pv)):
        o = np.asarray(ours)[is_in]
        r = ref[is_in]
        assert np.isfinite(o).all()
        # same iteration order; residual = f32 vs double intermediates,
        # which can shift the sweep count by one near the 1e-2 threshold
        # (one extra sweep moves q by up to ~1e-2 relative)
        assert np.abs(o - r).max() < 3e-2 * scale
        assert np.median(np.abs(o - r)) < 2e-3 * scale
    # the 1e-2-converged q can add more absolute noise than the tiny
    # initial divergence of a near-quiescent flow, so div may not shrink;
    # the reference only gates at DIV_ERR_THRESHOLD (StableSolver2D.h:23)
    div_s = float(stencil.div_error_2d(su, sv, s.ga.types, s.pa.dx, s.pa.dy))
    assert div_s < stable2d.DIV_ERR_THRESHOLD
