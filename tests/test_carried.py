"""Carried-state API (adi3d.nl_carried_*): the whole simulation runs on
stacked 4-var arrays kept in the L_Z kernel layout across steps, with the
next step's operand written in-kernel by the X direction's final targeted
pair kernel.  Same kernels, same per-cell operands as the step API — so
an n-step carried run must be BITWISE equal to n adi_timestep_3d calls
(only the XLA glue between steps differs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cmcfs_tpu.core.types import NodeType
from cmcfs_tpu.ops.masks import INTERIOR


def _setup():
    import __graft_entry__ as g
    adi3d, ga, cur, pa = g._setup(32, 19, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    return adi3d, ga, cur, pa, merge_ok


def test_carried_matches_step_api_bitwise():
    adi3d, ga, cur, pa, merge_ok = _setup()
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    pre = adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok)
    assert pre is not None and pre["backend"] == "fused_nl"

    # step API: 3 steps with the reference cur/next swap (bench.py loop)
    state, nxt = cur, cur
    for _ in range(3):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga, dt, 2, 2, pa,
                                       backend="fused_nl", exact=True,
                                       compute_error=False,
                                       merge_ok=merge_ok)
        state, nxt = new, state

    curZ, prevZ = adi3d.nl_carried_begin(cur, cur)
    for _ in range(3):
        nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa, 2, 2,
                                     exact=True)
        curZ, prevZ = nxtZ, curZ
    out = adi3d.nl_carried_end(curZ)
    for r, o in zip(state, out):
        assert (np.asarray(o) == np.asarray(r)).all()


def test_carried_matches_cli_sequence_bitwise():
    """cli3d's ``carried`` flag replaces the per-step sequence
    (UpdateBoundaries on cur AND next, then TimeStep with in-jit
    divergence error) by carried steps with reseed_bv=True (the
    UpdateBoundaries done in-layout — FREE-BC rows overwrite boundary
    cells with mirror values each step, so the re-seed is NOT a no-op)
    and the error evaluated on nl_carried_end at events.  FIELDS must
    match the default loop bitwise; the divergence METRIC is a full-grid
    f32 sum whose reduction order depends on the fusion context (in-step
    jit vs standalone jit), so it matches to reduction-order tolerance
    only (~1e-5 relative observed)."""
    from cmcfs_tpu.models.common3d import update_boundaries
    from cmcfs_tpu.ops import stencil

    adi3d, ga, cur, pa, merge_ok = _setup()
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)

    state, nxt = cur, cur
    errs = []
    for _ in range(3):
        state = update_boundaries(state, ga)
        nxt = update_boundaries(nxt, ga)
        new, err = adi3d.adi_timestep_3d(state, nxt, ga, dt, 2, 2, pa,
                                         backend="fused_nl", exact=True,
                                         compute_error=True,
                                         merge_ok=merge_ok)
        state, nxt = new, state
        errs.append(float(err))

    pre = adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok)
    assert pre is not None
    c0 = update_boundaries(cur, ga)
    curZ, prevZ = adi3d.nl_carried_begin(c0, c0)
    errs_c = []
    for _ in range(3):
        nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa, 2, 2,
                                     exact=True, reseed_bv=True)
        curZ, prevZ = nxtZ, curZ
        cc = adi3d.nl_carried_end(curZ)
        errs_c.append(float(stencil.div_error_3d(cc.u, cc.v, cc.w,
                                                 ga.types, pa.dx, pa.dy,
                                                 pa.dz)))
    out = adi3d.nl_carried_end(curZ)
    for r, o in zip(state, out):
        assert (np.asarray(o) == np.asarray(r)).all()
    np.testing.assert_allclose(errs, errs_c, rtol=5e-4, atol=0.0)


def test_carried_sharded_matches_per_step_sharded():
    """Round-5: the carried loop under a 1-D plan — state carried
    grid-Y-sharded @ L_Z across steps, per-shard targeted kernels
    (_nl_targeted_sharded_call), the X direction's final L_Z write
    landing collective-free on the carried sharding — must be BITWISE
    equal to (a) the per-step sharded loop and (b) the single-chip
    carried loop.  The reference's multi-GPU path keeps state
    device-resident across TimeSteps likewise
    (FluidSolver3D.cpp:226-262)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    # ny divisible by the 8 shards (the carried-loop precondition)
    _, ga, cur, pa = g._setup(32, 24, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    pre = adi3d.nl_carried_pre(ga_s, "fused_nl", 2, merge_ok, plan=plan)
    assert pre is not None and pre["plan"] is plan

    # per-step sharded loop (the bench-loop cur/next swap)
    state, nxt = cur_s, cur_s
    for _ in range(3):
        new, _ = adi3d.adi_timestep_3d(state, nxt, ga_s, dt, 2, 2, pa,
                                       backend="fused_nl", exact=True,
                                       compute_error=False,
                                       merge_ok=merge_ok, plan=plan)
        state, nxt = new, state

    curZ, prevZ = adi3d.nl_carried_begin(cur_s, cur_s, plan=plan)
    for _ in range(3):
        nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa, 2, 2,
                                     exact=True)
        curZ, prevZ = nxtZ, curZ
    out = adi3d.nl_carried_end(curZ, plan=plan)
    for r, o in zip(state, out):
        assert (np.asarray(o) == np.asarray(r)).all(), \
            "sharded carried != sharded per-step"

    # and vs the single-chip carried loop
    pre1 = adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok)
    curZ, prevZ = adi3d.nl_carried_begin(cur, cur)
    for _ in range(3):
        nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre1, dt, pa, 2, 2,
                                     exact=True)
        curZ, prevZ = nxtZ, curZ
    ref = adi3d.nl_carried_end(curZ)
    for r, o in zip(ref, out):
        assert (np.asarray(o) == np.asarray(r)).all(), \
            "sharded carried != single-chip carried"


def test_carried_pre_refuses_non_targeted_dispatch():
    """nl_carried_pre must return None whenever the targeted stacked step
    would not engage (the carried loop has no fallback of its own) — and,
    sharded, when grid Y cannot split evenly (a per-step y-pad can't be
    carried across steps); solver3d.carried_runner must WARN about the
    sharded degradation (a silent drop cost -7.3%/step on silicon)."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    assert adi3d.nl_carried_pre(ga, "fused_nl", 3, merge_ok) is None
    assert adi3d.nl_carried_pre(ga, "fused", 2, merge_ok) is None
    saved = adi3d.NL_TARGETED
    try:
        adi3d.NL_TARGETED = False
        assert adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok) is None
    finally:
        adi3d.NL_TARGETED = saved
    # sharded: ny=19 doesn't split over 8 shards -> None + a warning
    # through the solver-level wrapper
    import warnings as _w
    from cmcfs_tpu.parallel.mesh import make_x_mesh
    plan = make_x_mesh(8)
    assert adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok,
                                plan=plan) is None

    class _S:
        pass
    s = _S()
    s.ga, s.backend, s.merge_ok, s.plan = ga, "fused_nl", merge_ok, plan
    from cmcfs_tpu.models.solver3d import AdiSolver3D
    with _w.catch_warnings(record=True) as wlist:
        _w.simplefilter("always")
        assert AdiSolver3D.carried_runner(s, 2) is None
    assert any("SHARDED" in str(w.message) for w in wlist)


def test_carried_seed_elision_bitwise_and_refusal():
    """NL_CARRIED_NOSEED (round 5, VERDICT r4 #7): on a grid with no FREE
    bc anywhere on the BOUND/VALVE set, and with BOTH initial layers
    update_boundaries-seeded (what bench.py and cli3d guarantee), every
    bv cell's value is step-invariant — Dirichlet rows write exactly
    d=val, uncovered cells are merge-preserved — so the carried step's
    per-step re-seed where() is a bitwise no-op and is elided
    (assume_seeded=True + pre["seed_elidable"]).  Pins: (a) multi-step
    BITWISE equality elided-vs-where for both reseed_bv modes, (b) the
    predicate refuses on a FREE-bc grid, (c) the kill-switch."""
    from cmcfs_tpu.models.common3d import update_boundaries

    adi3d, ga, cur, pa, merge_ok = _setup()
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    pre = adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok)
    assert pre is not None and pre["seed_elidable"] is True

    c0 = update_boundaries(cur, ga)
    for reseed in (False, True):
        outs = []
        for elide in (True, False):
            curZ, prevZ = adi3d.nl_carried_begin(c0, c0)
            for _ in range(3):
                nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa,
                                             2, 2, exact=True,
                                             reseed_bv=reseed,
                                             assume_seeded=elide)
                curZ, prevZ = nxtZ, curZ
            outs.append(adi3d.nl_carried_end(curZ))
        for a, b in zip(outs[0], outs[1]):
            assert (np.asarray(a) == np.asarray(b)).all(), \
                f"seed elision not bitwise (reseed_bv={reseed})"

    # FREE-bc grid (the dual-baffle fixture sets bc_temp=FREE on the
    # baffle): T must keep its re-seed (FREE rows rewrite boundary cells
    # with solved mirror values each step) while u/v/w (bc_vel
    # all-NoSlip) elide — the PARTIAL path, which updates the T channel
    # in place on the donated prevZ buffer.  Bitwise vs the full where.
    import __graft_entry__ as g
    adi3d_, ga_f, cur_f, pa_f = g._setup(32, 19, 21, "scan", baffle=True)
    is_in = np.asarray(ga_f.types) == NodeType.IN
    mok = tuple(
        bool(((np.asarray(ga_f.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    pre_f = adi3d_.nl_carried_pre(ga_f, "fused_nl", 2, mok)
    if pre_f is not None:
        assert pre_f["seed_elidable"] is False
        assert pre_f["seed_vars"] == (3,)
        c0f = update_boundaries(cur_f, ga_f)
        for reseed in (False, True):
            outs = []
            for elide in (True, False):
                curZ, prevZ = adi3d_.nl_carried_begin(c0f, c0f)
                for _ in range(3):
                    nxtZ = adi3d_.nl_carried_step(curZ, prevZ, pre_f,
                                                  dt, pa_f, 2, 2,
                                                  exact=True,
                                                  reseed_bv=reseed,
                                                  assume_seeded=elide)
                    curZ, prevZ = nxtZ, curZ
                outs.append(adi3d_.nl_carried_end(curZ))
            for a, b in zip(outs[0], outs[1]):
                assert (np.asarray(a) == np.asarray(b)).all(), \
                    f"partial seed elision not bitwise (reseed={reseed})"

    # kill-switch: CMCFS_NL_CARRIED_NOSEED=0 / module flag
    saved = adi3d.NL_CARRIED_NOSEED
    try:
        adi3d.NL_CARRIED_NOSEED = False
        pre_off = adi3d.nl_carried_pre(ga, "fused_nl", 2, merge_ok)
    finally:
        adi3d.NL_CARRIED_NOSEED = saved
    assert pre_off["seed_elidable"] is False
    assert pre_off["seed_vars"] == (0, 1, 2, 3)


def test_carried_seed_elision_sharded_bitwise():
    """The partial/full seed elision under a sharding plan (what
    ``cli3d shards N carried`` runs): donated in-place channel updates
    and elided channels must stay BITWISE vs the full where() on the
    8-device virtual mesh."""
    from cmcfs_tpu.models.common3d import update_boundaries
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(32, 24, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    pre = adi3d.nl_carried_pre(ga_s, "fused_nl", 2, merge_ok, plan=plan)
    assert pre is not None and pre["seed_elidable"] is True

    c0 = update_boundaries(cur_s, ga_s)
    outs = []
    for elide in (True, False):
        curZ, prevZ = adi3d.nl_carried_begin(c0, c0, plan=plan)
        for _ in range(3):
            nxtZ = adi3d.nl_carried_step(curZ, prevZ, pre, dt, pa, 2, 2,
                                         exact=True, reseed_bv=True,
                                         assume_seeded=elide)
            curZ, prevZ = nxtZ, curZ
        outs.append(adi3d.nl_carried_end(curZ, plan=plan))
    for a, b in zip(outs[0], outs[1]):
        assert (np.asarray(a) == np.asarray(b)).all(), \
            "sharded seed elision not bitwise"
