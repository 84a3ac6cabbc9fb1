"""Dual-endpoint (MAX_SEGS_PER_ROW=2) coverage.

The reference solves up to two segments per row in one kernel launch
(Grid3D.h:43, segment enumeration Grid3D.cpp:47-127, one-thread-per-
segment kernel AdiSolver3D.cu:376-404).  Our dense formulation resolves
the shared endpoint with a two-pass cls_a/cls_b stitch (ops/masks.py) —
EXCEPT when every dual cell is Dirichlet for both BCs, where the BC0 and
BC1 roles generate the identical identity row and grid_arrays elides the
pass-B solve entirely (models/common3d.py).  These tests pin both halves:
the elision must be bitwise-neutral, and genuinely FREE duals must keep
the stitch.
"""
import numpy as np
import jax.numpy as jnp

from cmcfs_tpu.core.params import FluidParams
from cmcfs_tpu.core.types import NodeType, BCtype
from cmcfs_tpu.geom.synthetic import lid_cavity_3d
from cmcfs_tpu.models import adi3d
from cmcfs_tpu.models.common3d import grid_arrays, init_state


def _noslip_baffled(nx, ny, nz):
    """All-Dirichlet baffle: X-direction duals whose BC0/BC1 rows are
    identical — the inert case grid_arrays elides."""
    grid = lid_cavity_3d(nx, ny, nz)
    mid = nx // 2
    grid.types[mid, 2:-2, 2:-2] = NodeType.BOUND
    grid.types[mid, ny // 2 - 1:ny // 2 + 1, 2:-2] = NodeType.IN
    return grid


def _free_baffled(nx, ny, nz):
    """Baffle with FREE temperature BC: non-inert duals, stitch required."""
    grid = _noslip_baffled(nx, ny, nz)
    mid = nx // 2
    baffle = np.zeros(grid.types.shape, dtype=bool)
    baffle[mid, 2:-2, 2:-2] = True
    baffle &= np.asarray(grid.types) == NodeType.BOUND
    grid.bc_temp[baffle] = BCtype.FREE
    return grid


def _pa(grid):
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    return adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                                (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                                 grid.dx, grid.dy, grid.dz)])


def test_inert_dual_elision():
    """All-Dirichlet duals are elided; FREE duals are kept."""
    g_in = _noslip_baffled(16, 12, 12)
    ga = grid_arrays(g_in)
    assert ga.cls_b[0] is None and ga.take_b[0] is None
    ga_full = grid_arrays(g_in, elide_inert_duals=False)
    assert ga_full.cls_b[0] is not None

    g_free = _free_baffled(16, 12, 12)
    gaf = grid_arrays(g_free)
    assert gaf.cls_b[0] is not None and gaf.take_b[0] is not None


def test_inert_dual_elision_bitwise_scan():
    """Eliding the inert pass-B stitch changes nothing, bitwise, on the
    exact-order scan backend over a multi-step trajectory."""
    grid = _noslip_baffled(18, 13, 14)
    ga = grid_arrays(grid)
    ga_full = grid_arrays(grid, elide_inert_duals=False)
    cur = init_state(grid)
    pa = _pa(grid)
    dt = jnp.float32(0.01)
    a, b = cur, cur
    for _ in range(3):
        a, ea = adi3d.adi_timestep_3d(a, a, ga, dt, 2, 2, pa,
                                      backend="scan", compute_error=True)
        b, eb = adi3d.adi_timestep_3d(b, b, ga_full, dt, 2, 2, pa,
                                      backend="scan", compute_error=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert float(ea) == float(eb)


def test_inert_dual_elision_bitwise_fused():
    """Same neutrality on the fused kernel path (which the elision newly
    enables for the whole direction)."""
    grid = _noslip_baffled(16, 12, 12)
    ga = grid_arrays(grid)
    ga_full = grid_arrays(grid, elide_inert_duals=False)
    assert ga.cls_b[0] is None and ga_full.cls_b[0] is not None
    cur = init_state(grid)
    pa = _pa(grid)
    dt = jnp.float32(0.01)
    a, _ = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, 2, pa,
                                 backend="fused_dma", compute_error=False)
    b, _ = adi3d.adi_timestep_3d(cur, cur, ga_full, dt, 1, 2, pa,
                                 backend="fused_dma", compute_error=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bench_case_duals_inert_and_stacked_engages():
    """The driver bench case's Y-direction duals are all NOSLIP: after the
    elision the whole grid is dual-free and the stacked-carry pair-kernel
    step engages (the round-3 verdict's 2.5x finding — the bench case ran
    the Y fallback because _nl_stacked_possible was False)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.gen_box_case import gen
    from cmcfs_tpu.core.config import Config
    from cmcfs_tpu.cli3d import build_grid
    from cmcfs_tpu.ops.masks import INTERIOR

    case_dir = os.path.join(os.path.dirname(__file__), "..", "out",
                            "benchcase_test")
    # dx=0.01636 -> 65^3: same geometry class as the 256^3 driver bench
    # (dual Y lines, merge_ok all-True); odd sizes like 33^3 land runs on
    # the domain edge and lose merge_ok, which is a different gate
    data, cfgp = gen(case_dir, dx=0.01636, time_steps=4,
                     num_global=4, num_local=2)
    cfg = Config.load(cfgp)
    grid = build_grid(cfg, data)
    ga = grid_arrays(grid)
    # the raw geometry HAS Y duals; they are all-Dirichlet, hence elided
    ga_full = grid_arrays(grid, elide_inert_duals=False)
    assert ga_full.cls_b[1] is not None
    assert all(c is None for c in ga.cls_b)

    is_in = np.asarray(grid.types) == NodeType.IN
    merge_ok = tuple(bool(((np.asarray(ga.cls_a[ax]) == INTERIOR)
                           == is_in).all()) for ax in range(3))
    cur = init_state(grid)
    rep = adi3d.dispatch_report(cur.u.shape, ga, "fused_nl", 2, merge_ok)
    assert rep["stacked"], rep
    assert rep["dirs"] == {"X": "pair", "Y": "pair", "Z": "pair"}, rep


import pytest


@pytest.mark.parametrize("backend,nl,atol", [
    ("fused_nl", 2, 5e-7),     # in-kernel dual stitch, stacked+targeted
    ("fused_nl", 4, 1e-6),     # chained pairs with duals
    ("fused_pcr", 2, 5e-6),    # PCR dual chains (reordered elimination)
])
def test_free_duals_pair_kernel_matches_scan(backend, nl, atol):
    """FREE-BC duals through the num_local-pair kernel's in-kernel
    second-chain stitch (pallas_sweep_nl cls_b/take_b) vs the exact-order
    scan (which runs the two-pass XLA stitch).  CPU interpreter tolerance
    follows test_backends3d (~1 ulp from the in-kernel mul-by-reciprocal
    RHS build; bitwise on TPU)."""
    grid = _free_baffled(16, 12, 12)
    ga = grid_arrays(grid)
    assert ga.cls_b[0] is not None
    cur = init_state(grid)
    pa = _pa(grid)
    dt = jnp.float32(0.01)
    mo = (True, True, True)
    rep = adi3d.dispatch_report((16, 12, 12), ga, backend, nl, mo)
    assert rep["dirs"]["X"] == "pair" and rep["stacked"], rep

    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, nl, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, nl, pa,
                                    backend=backend, exact=True,
                                    compute_error=True, merge_ok=mo)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=atol)
    assert abs(float(e0) - float(e1)) < 1e-6


def test_free_duals_step_structure_variants_bitwise():
    """The three step structures (per-direction xmode, plain stacked,
    targeted stacked) must agree BITWISE with each other on a dual grid —
    they drive the identical kernels with identical operands."""
    grid = _free_baffled(16, 12, 12)
    ga = grid_arrays(grid)
    cur = init_state(grid)
    pa = _pa(grid)
    dt = jnp.float32(0.01)
    mo = (True, True, True)
    saved = (adi3d.NL_STACKED, adi3d.NL_TARGETED)
    outs = {}
    try:
        for name, st, tg in (("perdir", False, False),
                             ("stacked", True, False),
                             ("targeted", True, True)):
            adi3d.NL_STACKED, adi3d.NL_TARGETED = st, tg
            adi3d.adi_timestep_3d.clear_cache()
            outs[name], _ = adi3d.adi_timestep_3d(
                cur, cur, ga, dt, 2, 2, pa, backend="fused_nl", exact=True,
                compute_error=False, merge_ok=mo)
    finally:
        adi3d.NL_STACKED, adi3d.NL_TARGETED = saved
        adi3d.adi_timestep_3d.clear_cache()
    for name in ("stacked", "targeted"):
        for r, o in zip(outs["perdir"], outs[name]):
            assert (np.asarray(o) == np.asarray(r)).all(), name
