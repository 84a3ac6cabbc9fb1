"""Engagement telemetry (adi3d.dispatch_report) + gated-mode degrade paths.

The reference prints its per-direction segment decisions
(OutputSegmentsInfo, AdiSolver3D.cpp:270-284); round 3's silent dispatch
let two silicon A/Bs measure fallback-vs-fallback.  These tests pin the
report against every dispatch class, and pin the NL_TARGETED VMEM degrade
gate at the documented 256^3 thresholds (round-3 advisor item: a
regression in nl_vmem_request's constants must fail a cheap CPU test, not
a TPU compile)."""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from cmcfs_tpu.core.params import FluidParams
from cmcfs_tpu.core.types import NodeType
from cmcfs_tpu.geom.synthetic import lid_cavity_3d
from cmcfs_tpu.models import adi3d
from cmcfs_tpu.models.common3d import grid_arrays, init_state
from cmcfs_tpu.ops.masks import INTERIOR


def _fixture(nx=32, ny=32, nz=32):
    grid = lid_cavity_3d(nx, ny, nz)
    ga = grid_arrays(grid)
    is_in = np.asarray(grid.types) == NodeType.IN
    mo = tuple(bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
               for ax in range(3))
    return grid, ga, mo


@pytest.mark.parametrize("backend,nl,stacked,path", [
    ("fused_nl", 2, True, "pair"),
    ("fused_nl", 4, True, "pair"),
    ("fused_nl", 1, False, "stream"),
    ("fused_nl", 3, False, "pair+stream"),
    ("fused_full", 2, False, "stream"),
    ("fused_pcr", 2, True, "pair"),
    ("fused_bf16", 2, True, "pair"),
    ("scan", 2, False, "fallback"),
    ("fused_dma", 2, False, "fallback"),
])
def test_dispatch_report_paths(backend, nl, stacked, path):
    _, ga, mo = _fixture()
    rep = adi3d.dispatch_report((32, 32, 32), ga, backend, nl, mo)
    assert rep["stacked"] == stacked, rep
    assert rep["dirs"] == {"X": path, "Y": path, "Z": path}, rep


def test_dispatch_report_duals():
    """Non-inert (FREE) duals ride the pair kernel's in-kernel stitch at
    even num_local; odd num_local (stream-kernel tail, no dual support)
    and the pure-stream backends fall back."""
    from tests.test_duals import _free_baffled
    grid = _free_baffled(16, 12, 12)
    ga = grid_arrays(grid)
    rep = adi3d.dispatch_report((16, 12, 12), ga, "fused_nl", 2,
                                (True, True, True))
    assert rep["dirs"]["X"] == "pair", rep
    assert rep["stacked"]
    rep3 = adi3d.dispatch_report((16, 12, 12), ga, "fused_nl", 3,
                                 (True, True, True))
    assert rep3["dirs"]["X"] == "fallback", rep3
    assert rep3["dirs"]["Y"] == "pair+stream", rep3   # Y is dual-free
    repf = adi3d.dispatch_report((16, 12, 12), ga, "fused_full", 2,
                                 (True, True, True))
    assert repf["dirs"]["X"] == "fallback", repf


def test_dispatch_report_long_lines_fall_back():
    _, ga, mo = _fixture()
    # shape beyond MAX_SWEEP on one axis -> that direction long-line path
    rep = adi3d.dispatch_report((512, 32, 32), ga, "fused_nl", 2, mo)
    assert rep["dirs"]["X"] == "fallback"
    assert not rep["stacked"]


def test_targeted_vmem_degrade_thresholds():
    """The documented 256^3 grant-cap outcomes (NOTES_NEXT 0b): pcr x
    targeted exceeds the 110 MB Mosaic cap (f32 AND bf16) and must degrade;
    plain fused_nl targeted fits."""
    s = (256, 256, 256)
    assert adi3d._nl_targeted_vmem_ok(s, pcr=False, bf16=False)
    assert adi3d._nl_targeted_vmem_ok(s, pcr=False, bf16=True)
    assert not adi3d._nl_targeted_vmem_ok(s, pcr=True, bf16=False)
    assert not adi3d._nl_targeted_vmem_ok(s, pcr=True, bf16=True)
    # and dispatch_report reflects the same gate when NL_TARGETED is on
    _, ga, mo = _fixture()
    saved = adi3d.NL_TARGETED
    try:
        adi3d.NL_TARGETED = True
        rep = adi3d.dispatch_report(s, ga, "fused_pcr", 2,
                                    (True, True, True))
        assert rep["stacked"] and not rep["targeted"], rep
        rep = adi3d.dispatch_report(s, ga, "fused_nl", 2,
                                    (True, True, True))
        assert rep["stacked"] and rep["targeted"], rep
    finally:
        adi3d.NL_TARGETED = saved


def test_dispatch_report_targeted_under_plan():
    """Round-5 closure of "the multi-chip path must run the fast program"
    (the reference's multi-GPU path runs the same hot kernels,
    AdiSolver3D.cu:376-404): under a 1-D sharding plan the dispatch must
    still take the targeted-layout stacked step.  The VMEM degrade gate
    applies unchanged — the kernel blocks over its j-dim, so splitting j
    across shards does NOT shrink the per-block request (pcr x targeted
    at 256^3 degrades sharded exactly as it does single-chip)."""
    from cmcfs_tpu.parallel.mesh import make_x_mesh
    _, ga, mo = _fixture()
    plan = make_x_mesh(8)
    saved = adi3d.NL_TARGETED
    try:
        adi3d.NL_TARGETED = True
        rep = adi3d.dispatch_report((32, 32, 32), ga, "fused_nl", 2, mo,
                                    plan)
        assert rep["stacked"] and rep["targeted"], rep
        s = (256, 256, 256)
        assert not adi3d._nl_targeted_vmem_ok(s, pcr=True, bf16=False)
        assert not adi3d._nl_targeted_vmem_ok(s, pcr=True, bf16=False,
                                              plan=plan)
        rep = adi3d.dispatch_report(s, ga, "fused_pcr", 2,
                                    (True, True, True), plan)
        assert rep["stacked"] and not rep["targeted"], rep
        # the production f32 fused_nl at 256^3 stays targeted sharded
        rep = adi3d.dispatch_report(s, ga, "fused_nl", 2,
                                    (True, True, True), plan)
        assert rep["stacked"] and rep["targeted"], rep
    finally:
        adi3d.NL_TARGETED = saved


def test_targeted_degrade_warns_and_stays_bitwise(monkeypatch):
    """When the VMEM gate refuses the targeted step, _nl_stacked_step must
    warn and produce the plain stacked step's (bitwise-identical) result."""
    grid, ga, mo = _fixture(16, 16, 16)
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)

    saved = adi3d.NL_TARGETED
    try:
        adi3d.NL_TARGETED = False
        adi3d.adi_timestep_3d.clear_cache()
        ref, _ = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                       backend="fused_nl", exact=True,
                                       compute_error=False, merge_ok=mo)
        adi3d.NL_TARGETED = True
        monkeypatch.setattr(adi3d, "_nl_targeted_vmem_ok",
                            lambda *a, **k: False)
        adi3d.adi_timestep_3d.clear_cache()
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            out, _ = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                           backend="fused_nl", exact=True,
                                           compute_error=False, merge_ok=mo)
        assert any("NL_TARGETED degraded" in str(w.message) for w in wlist)
        for r, o in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    finally:
        adi3d.NL_TARGETED = saved
        adi3d.adi_timestep_3d.clear_cache()
