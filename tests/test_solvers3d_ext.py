"""3D Explicit/Stable extensions (the reference stubs these schemes)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cmcfs_tpu.core.params import FluidParams
from cmcfs_tpu.geom.synthetic import lid_cavity_3d
from cmcfs_tpu.models.solver3d import make_solver_3d


@pytest.mark.parametrize("name", ["Explicit", "Stable", "ADI"])
def test_solver3d_runs(name):
    grid = lid_cavity_3d(24, 24, 24, dx=0.02, lid_velocity=0.2)
    params = FluidParams.normalized(200.0, 0.72, 1.4)
    s = make_solver_3d(name, backend="scan")
    s.init(grid, params)
    for _ in range(3):
        s.update_boundaries()
        s.time_step(0.01, 2, 1, compute_error=True)
        assert np.isfinite(s.last_err)
    u = np.asarray(s.cur.u)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 0


def test_stable3d_reduces_divergence():
    grid = lid_cavity_3d(24, 24, 24, dx=0.02, lid_velocity=0.2)
    params = FluidParams.normalized(200.0, 0.72, 1.4)
    adi = make_solver_3d("ADI", backend="scan")
    adi.init(grid, params)
    stb = make_solver_3d("Stable", backend="scan")
    stb.init(grid, params)
    for _ in range(3):
        adi.update_boundaries()
        adi.time_step(0.01, 2, 1)
        stb.update_boundaries()
        stb.time_step(0.01, 2, 1)
    # projection should keep the velocity field at least as divergence-free
    assert stb.last_err <= adi.last_err * 5
