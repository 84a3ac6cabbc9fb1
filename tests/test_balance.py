"""Load-balanced split padding (reference SplitSegments_X EVEN_SEGMENTS /
EVEN_VOLUME, Grid3D.cpp:148-235): the analysis must ACT — inserted inert
planes shift the even GSPMD cuts toward the balanced boundaries without
changing any result."""
import numpy as np
import jax.numpy as jnp

from cmcfs_tpu.core.types import NodeType


def _uneven_grid(nx=29, ny=16, nz=16):
    """A small cavity (IN planes 2..7) in a mostly-empty 29-plane domain.
    On an 8-mesh (chunk 4 after padding to 32) the end-padded even split
    puts 4 loaded planes in one shard; shifting the cavity by the 3
    padding planes lands it on a 3+3 split — a case where insert-balancing
    provably helps."""
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    grid = lid_cavity_3d(nx, ny, nz)
    cut = 9
    wall = np.asarray(grid.types[cut - 1])
    wall[wall != NodeType.OUT] = NodeType.BOUND
    grid.types[cut - 1] = wall
    grid.vel[cut - 1] = 0.0
    grid.types[cut:] = NodeType.OUT
    grid.vel[cut:] = 0.0
    return grid


def test_plan_padding_improves_balance():
    from cmcfs_tpu.parallel import balance as bal
    grid = _uneven_grid()
    types = np.asarray(grid.types)
    n = 8
    pad = (-types.shape[0]) % n
    load = bal.load_per_plane(types, "EVEN_VOLUME")
    end_only = [types.shape[0]] * pad
    ins = bal.plan_padding(types, n, policy="EVEN_VOLUME")
    assert len(ins) == pad
    worst_end = bal._even_chunk_loads(load, end_only, n).max()
    worst_bal = bal._even_chunk_loads(load, ins, n).max()
    assert worst_bal < worst_end  # the empty half absorbs the padding
    # inserts only at safe positions
    safe = set(bal.safe_insert_positions(types))
    assert set(ins) <= safe


def test_balanced_split_results_identical():
    """Balanced insert padding must be numerically inert: the sharded run
    with balance=EVEN_VOLUME matches the unsharded trajectory exactly."""
    import jax
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.models.solver3d import AdiSolver3D
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    p = FluidParams.normalized(200.0, 0.72, 1.4)

    def run(balanced):
        grid = _uneven_grid()
        s = AdiSolver3D(backend="scan")
        s.init(grid, p)
        if balanced:
            s.set_plan(make_x_mesh(8), balance="EVEN_VOLUME")
            assert s._x_keep is not None, "expected non-trailing inserts"
        for _ in range(2):
            s.update_boundaries()
            s.time_step(0.01, 2, 1, compute_error=True)
        u, v, w, T = s.get_layer(29, 16, 16)
        return np.asarray(u), np.asarray(T), s.last_err

    u0, T0, e0 = run(False)
    u1, T1, e1 = run(True)
    # identical masks; values to 1-ulp (different padded extents compile
    # with different FMA contractions, same class as PARITY.md 7)
    np.testing.assert_array_equal(u1 > 9e4, u0 > 9e4)
    np.testing.assert_allclose(u1, u0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(T1, T0, rtol=0, atol=1e-6)
    assert abs(e0 - e1) < 1e-7
