"""2D ADI on the fused Pallas kernels (3-var, 2D boundary rows) must agree
with the exact-order scan — short (VMEM-resident) and long (chunked) lines,
incl. FREE boundary rows (the +1/-1 2D forms, AdiSolver2D.cpp:74-116)."""
import numpy as np
import jax.numpy as jnp
import pytest


def _setup(nx, ny, with_free=True):
    from cmcfs_tpu.geom.synthetic import lid_cavity_2d
    from cmcfs_tpu.core.types import BCtype
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.models import adi2d
    from cmcfs_tpu.models.common2d import grid_arrays, init_state, update_boundaries

    g = lid_cavity_2d(nx, ny, dx=0.002)
    if with_free:
        # make the outflow side FREE so the 2D +1/-1 rows are exercised
        g.cur_bct[nx - 2, 2:-2] = BCtype.FREE
    ga = grid_arrays(g)
    cur = update_boundaries(init_state(g), ga)
    p = FluidParams.physical(0.05, 1000.0, 461.495, 0.6, 4200.0)
    pa = adi2d.ParamsArgs(*[jnp.float32(x) for x in
                            (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                             g.dx, g.dy, g.start_T)])
    return adi2d, ga, cur, pa


@pytest.mark.parametrize("dims", [(48, 40),      # VMEM-resident kernel
                                  (320, 160)])   # chunked long-line kernel
def test_2d_fused_matches_scan(dims):
    adi2d, ga, cur, pa = _setup(*dims)
    dt = jnp.float32(0.001)
    ref, e0, it0 = adi2d.adi_timestep_2d(cur, ga, dt, jnp.int32(2), 1, pa,
                                         backend="scan", exact=True)
    out, e1, it1 = adi2d.adi_timestep_2d(cur, ga, dt, jnp.int32(2), 1, pa,
                                         backend="fused_dma", exact=True)
    assert int(it0) == int(it1)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-7)
    assert abs(float(e0) - float(e1)) < 1e-7


def test_2d_fused_bf16_close():
    adi2d, ga, cur, pa = _setup(48, 40)
    dt = jnp.float32(0.001)
    ref, e0, _ = adi2d.adi_timestep_2d(cur, ga, dt, jnp.int32(2), 1, pa,
                                       backend="scan", exact=True)
    out, e1, _ = adi2d.adi_timestep_2d(cur, ga, dt, jnp.int32(2), 1, pa,
                                       backend="fused_bf16", exact=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=0.02)
    assert np.isfinite(float(e1))


@pytest.mark.parametrize("dims,nl", [((48, 40), 1), ((48, 40), 2),
                                     ((320, 160), 1)])
def test_2d_stream_fused_matches_scan(dims, nl):
    """2D full fusion (stream kernel merge2d mode: in-kernel RHS build +
    solve + copy-then-merge, AdiSolver2D.cpp:203-226) — incl. num_local=2
    (first-iteration copy, then average) and FREE rows."""
    adi2d, ga, cur, pa = _setup(*dims)
    stream_ok = adi2d.stream_ok_2d(ga)
    assert all(stream_ok), stream_ok
    dt = jnp.float32(0.001)
    ref, e0, it0 = adi2d.adi_timestep_2d(cur, ga, dt, jnp.int32(2), nl, pa,
                                         backend="scan", exact=True)
    out, e1, it1 = adi2d.adi_timestep_2d(cur, ga, dt, jnp.int32(2), nl, pa,
                                         backend="fused_full", exact=True,
                                         stream_ok=stream_ok)
    assert int(it0) == int(it1)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-7)
    assert abs(float(e0) - float(e1)) < 1e-7
