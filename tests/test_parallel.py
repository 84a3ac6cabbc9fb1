"""Sharded 3D step on the virtual 8-device CPU mesh (MGPU_EMU analogue) and
graft entry points."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dryrun_multichip_8():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The X-sharded step must produce the same trajectory as 1-device."""
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    grid = lid_cavity_3d(32, 16, 16)
    ga = grid_arrays(grid)
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)

    ref, err_ref = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 1, pa,
                                         backend="scan", compute_error=True)

    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    sh = plan.state_sharding()
    ga_s = ga._replace(
        types=jax.device_put(ga.types, sh),
        cls_a=tuple(jax.device_put(c, sh) for c in ga.cls_a))
    out, err = adi3d.adi_timestep_3d(cur_s, cur_s, ga_s, dt, 2, 1, pa,
                                     backend="scan", compute_error=True,
                                     plan=plan)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-7)
    assert abs(float(err) - float(err_ref)) < 1e-9


def _baffled_cavity(nx, ny, nz, free_T: bool = True):
    """Lid cavity with a one-cell BOUND baffle plane at mid-X pierced by a
    hole: X lines crossing the baffle get dual endpoints (two fluid runs
    sharing the separating cell), exercising the cls_b two-pass stitch
    (reference MAX_SEGS_PER_ROW, Grid3D.h:43).

    ``free_T``: give the baffle cells a FREE temperature BC so the duals
    are genuinely non-inert — all-Dirichlet duals produce identical BC0/
    BC1 rows and grid_arrays elides the pass-B stitch entirely
    (models/common3d.py), which would leave the dual path untested."""
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    from cmcfs_tpu.core.types import NodeType, BCtype

    grid = lid_cavity_3d(nx, ny, nz)
    mid = nx // 2
    baffle = np.zeros(grid.types.shape, dtype=bool)
    baffle[mid, 2:-2, 2:-2] = True
    grid.types[baffle] = NodeType.BOUND
    grid.types[mid, ny // 2 - 1:ny // 2 + 1, 2:-2] = NodeType.IN  # the hole
    if free_T:
        grid.bc_temp[baffle] = BCtype.FREE
    return grid


def test_sharded_fused_matches_scan_with_duals():
    """shard_map'd fused kernel == GSPMD scan on the 8-mesh, over 3 steps,
    on a grid with dual endpoints; and sharding must be bitwise-neutral
    for the fused backend."""
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    grid = _baffled_cavity(32, 19, 21)
    ga = grid_arrays(grid)
    assert ga.cls_b[0] is not None, "fixture must have dual endpoints"
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)

    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)

    ref, f1, fd, sc = cur, cur_s, cur_s, cur_s
    for _ in range(3):
        ref, _ = adi3d.adi_timestep_3d(ref, ref, ga, dt, 2, 2, pa,
                                       backend="fused", compute_error=False)
        f1, _ = adi3d.adi_timestep_3d(f1, f1, ga_s, dt, 2, 2, pa,
                                      backend="fused", compute_error=False,
                                      plan=plan)
        # the manual-DMA hot path, sharded via the same shard_map wrapper
        fd, _ = adi3d.adi_timestep_3d(fd, fd, ga_s, dt, 2, 2, pa,
                                      backend="fused_dma", compute_error=False,
                                      plan=plan)
        sc, e_sc = adi3d.adi_timestep_3d(sc, sc, ga_s, dt, 2, 2, pa,
                                         backend="scan", compute_error=True,
                                         plan=plan)
    for r, f in zip(ref, f1):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(r))
    for r, f in zip(ref, fd):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(r))
    for s, f in zip(sc, f1):
        np.testing.assert_allclose(np.asarray(f), np.asarray(s),
                                   rtol=2e-5, atol=1e-6)
    assert np.isfinite(float(e_sc))


def test_sharded_long_horizon_matches_single_device():
    """10-step sharded trajectory (scan, 8-mesh, duals + balance-relevant
    geometry) vs single-device — drift must stay at reduction-rounding
    level over a horizon, not just 1-2 steps."""
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    grid = _baffled_cavity(32, 16, 16)
    ga = grid_arrays(grid)
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    ref, out = cur, cur_s
    for _ in range(10):
        ref, e0 = adi3d.adi_timestep_3d(ref, ref, ga, dt, 2, 1, pa,
                                        backend="scan")
        out, e1 = adi3d.adi_timestep_3d(out, out, ga_s, dt, 2, 1, pa,
                                        backend="scan", plan=plan)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)
    assert abs(float(e0) - float(e1)) < 1e-8


def test_entry_compiles():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    new, err = fn(*args)
    assert np.isfinite(float(err))


def test_cli3d_sharded_matches_unsharded(tmp_path):
    import os
    REFBUILD = os.path.join(os.path.dirname(__file__), "..", "refbuild")
    data = os.path.join(REFBUILD, "data", "box_pipe_2D_data.txt")
    cfg = os.path.join(REFBUILD, "cases", "box_pipe_3d.txt")
    if not os.path.exists(data):
        pytest.skip("refbuild/prepare.sh not run")
    from cmcfs_tpu.cli3d import run_case
    s1, e1 = run_case(data, str(tmp_path / "sh"), cfg, backend="scan",
                      quiet=True, max_steps=2, shards=4, collect_errs=True)
    s0, e0 = run_case(data, str(tmp_path / "un"), cfg, backend="scan",
                      quiet=True, max_steps=2, collect_errs=True)
    # dimx=53 padded to 56 with OUT planes; trajectories agree to reduction
    # rounding
    u1 = np.asarray(s1.cur.u)[:53]
    u0 = np.asarray(s0.cur.u)
    np.testing.assert_allclose(u1, u0, atol=2e-5)
    assert abs(e1[0] - e0[0]) < 1e-9


def test_wavefront_blocked_pipeline_matches_scan():
    """Z-blocked wavefront pipeline (the reference's `blocking nBlockZ`,
    AdiSolver3D.cu:642-881): bitwise vs the exact scan solve for any block
    count, including non-dividing requests (rounded to a divisor)."""
    from cmcfs_tpu.ops.tridiag import tridiag_solve
    from cmcfs_tpu.parallel.mesh import make_x_mesh
    from cmcfs_tpu.parallel.pipeline import pipelined_tridiag_x_blocked

    rng = np.random.default_rng(7)
    N, batch = 64, 48
    a = rng.normal(size=(N, batch)).astype(np.float32); a[0] = 0.0
    b = (rng.normal(size=(N, batch)) + 6.0).astype(np.float32)
    c = rng.normal(size=(N, batch)).astype(np.float32); c[-1] = 0.0
    d = rng.normal(size=(N, batch)).astype(np.float32)
    ref = np.asarray(tridiag_solve(*map(jnp.asarray, (a, b, c, d)),
                                   backend="scan"))
    plan = make_x_mesh(8)
    sh = jax.NamedSharding(plan.mesh, jax.sharding.PartitionSpec("x"))
    args = [jax.device_put(jnp.asarray(m), sh) for m in (a, b, c, d)]
    for nb in (1, 3, 5, 48):   # 5 does not divide 48 -> rounds to 4
        x = np.asarray(pipelined_tridiag_x_blocked(*args, plan=plan,
                                                   nblockz=nb))
        np.testing.assert_array_equal(x, ref)


def test_wavefront_step_matches_all_to_all():
    """Full sharded ADI step with the wavefront X sweep (`blocking` mode)
    vs the all_to_all reshard path (1-ulp FMA-contraction tolerance)."""
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.parallel.mesh import make_x_mesh, ShardingPlan

    grid = lid_cavity_3d(32, 19, 21)
    ga = grid_arrays(grid)
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    ref, e0 = adi3d.adi_timestep_3d(cur_s, cur_s, ga_s, dt, 2, 2, pa,
                                    backend="scan", plan=plan)
    plan_b = ShardingPlan(plan.mesh, plan.axis, nblockz=7)
    out, e1 = adi3d.adi_timestep_3d(cur_s, cur_s, ga_s, dt, 2, 2, pa,
                                    backend="scan", plan=plan_b)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-7)
    assert abs(float(e0) - float(e1)) < 1e-9


def test_pipelined_thomas_matches_scan():
    """Faithful pipelined distributed Thomas (parallel/pipeline.py) vs the
    single-device exact solve."""
    from cmcfs_tpu.ops.tridiag import tridiag_solve
    from cmcfs_tpu.parallel.mesh import make_x_mesh
    from cmcfs_tpu.parallel.pipeline import pipelined_tridiag_x

    rng = np.random.default_rng(3)
    N, batch = 64, 32
    a = rng.normal(size=(N, batch)).astype(np.float32)
    b = (rng.normal(size=(N, batch)) + 6.0).astype(np.float32)
    c = rng.normal(size=(N, batch)).astype(np.float32)
    d = rng.normal(size=(N, batch)).astype(np.float32)
    a[0] = 0.0
    c[-1] = 0.0

    ref = np.asarray(tridiag_solve(*map(jnp.asarray, (a, b, c, d)),
                                   backend="scan"))
    plan = make_x_mesh(8)
    sh = jax.NamedSharding(plan.mesh, jax.sharding.PartitionSpec("x"))
    args = [jax.device_put(jnp.asarray(m), sh) for m in (a, b, c, d)]
    x = np.asarray(pipelined_tridiag_x(*args, plan=plan))
    np.testing.assert_allclose(x, ref, rtol=1e-6, atol=1e-6)


def test_sharded_stream_fused_matches_unsharded():
    """Sharded fused_full: the Y/Z directions run the full-fusion stream
    kernel per shard (in-kernel RHS + merge); X reshards via the fused_dma
    path.  Must equal the unsharded fused_full step and track the sharded
    scan."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(32, 19, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    assert merge_ok[1] and merge_ok[2], "fixture must fold merges on Y/Z"
    dt = jnp.float32(0.01)

    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)

    ref, sh, sc = cur, cur_s, cur_s
    for _ in range(2):
        ref, _ = adi3d.adi_timestep_3d(ref, ref, ga, dt, 2, 2, pa,
                                       backend="fused_full",
                                       compute_error=False,
                                       merge_ok=merge_ok)
        sh, _ = adi3d.adi_timestep_3d(sh, sh, ga_s, dt, 2, 2, pa,
                                      backend="fused_full",
                                      compute_error=False,
                                      merge_ok=merge_ok, plan=plan)
        sc, _ = adi3d.adi_timestep_3d(sc, sc, ga_s, dt, 2, 2, pa,
                                      backend="scan", compute_error=False,
                                      plan=plan)
    for r, s in zip(ref, sh):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=0, atol=5e-7)
    for c, s in zip(sc, sh):
        np.testing.assert_allclose(np.asarray(s), np.asarray(c),
                                   rtol=2e-5, atol=1e-6)


def test_sharded_nl_pair_matches_unsharded():
    """Sharded fused_nl: the Y/Z directions run the num_local-pair kernel
    per shard with a 1-plane ppermute halo pre-exchange (the in-kernel
    dissipation's cross-shard derivative); X reshards via the fused_dma
    path.  Must equal the unsharded fused_nl step (which itself is
    bitwise vs fused_full/scan, test_backends3d)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(32, 19, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    assert merge_ok[1] and merge_ok[2], "fixture must fold merges on Y/Z"
    dt = jnp.float32(0.01)

    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)

    ref, sh = cur, cur_s
    for _ in range(2):
        ref, _ = adi3d.adi_timestep_3d(ref, ref, ga, dt, 2, 2, pa,
                                       backend="fused_nl",
                                       compute_error=False,
                                       merge_ok=merge_ok)
        sh, _ = adi3d.adi_timestep_3d(sh, sh, ga_s, dt, 2, 2, pa,
                                      backend="fused_nl",
                                      compute_error=False,
                                      merge_ok=merge_ok, plan=plan)
    for r, s in zip(ref, sh):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=0, atol=5e-7)


def _sharded_stacked_bitwise(backend, nl, dual=False):
    """The sharded stacked-carry step (adi3d.NL_STACKED with a plan: the
    whole num_global loop on 4-var stacks in kernel layouts, one uniform
    1-plane j-halo shard_map wrapper for all three directions, grid Y
    padded once for X's reshard divisibility) must be BITWISE equal to
    the sharded per-direction path (NL_STACKED=False) — the kernels see
    bit-identical per-cell operands; halo lines re-solve to the owner's
    bits and padded rows are identity rows either way.

    ``dual``: run on the FREE-baffled fixture instead — X lines carry
    dual endpoints and the kernels run the in-kernel cls_b/take_b stitch
    across the shard boundary (the geometry class of the reference's
    MAX_SEGS_PER_ROW=2 cases, Grid3D.h:43)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    if dual:
        grid = _baffled_cavity(32, 19, 21)
        ga = grid_arrays(grid)
        assert ga.cls_b[0] is not None, "dual fixture lost its duals"
        cur = init_state(grid)
        from cmcfs_tpu.core.params import FluidParams
        p = FluidParams.normalized(200.0, 0.72, 1.4)
        pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                                  (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                                   grid.dx, grid.dy, grid.dz)])
    else:
        _, ga, cur, pa = g._setup(32, 19, 21, "scan")
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

    saved = adi3d.NL_STACKED
    outs = {}
    try:
        for flag in (False, True):
            adi3d.NL_STACKED = flag
            adi3d.adi_timestep_3d.clear_cache()
            if flag:
                rep = adi3d.dispatch_report(cur.u.shape, ga, backend,
                                            nl, merge_ok, plan)
                assert rep["stacked"]
                # with NL_TARGETED on (the default) the sharded stacked
                # arm IS the targeted-layout program (round-5): this A/B
                # then pins targeted-sharded == per-direction sharded
                assert rep["targeted"] == (
                    adi3d.NL_TARGETED
                    and adi3d._nl_targeted_shape_ok(cur.u.shape)), rep
            sh = cur_s
            for _ in range(2):
                sh, _ = adi3d.adi_timestep_3d(sh, sh, ga_s, dt, 2, nl, pa,
                                              backend=backend,
                                              compute_error=False,
                                              merge_ok=merge_ok, plan=plan)
            outs[flag] = sh
    finally:
        adi3d.NL_STACKED = saved
        adi3d.adi_timestep_3d.clear_cache()
    for a, b in zip(outs[True], outs[False]):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_sharded_nl_stacked_carry_bitwise():
    """See _sharded_stacked_bitwise — the default-tier fused_nl nl=2
    case; the gated tier widens to nl=4 / bf16 / pcr."""
    _sharded_stacked_bitwise("fused_nl", 2)


def test_sharded_nl_stacked_carry_bitwise_duals():
    """The sharded stacked step on a grid WITH dual endpoints (in-kernel
    cls_b/take_b stitch under shard_map) — round-4 verdict item 7."""
    _sharded_stacked_bitwise("fused_nl", 2, dual=True)


def test_sharded_nl_pair_duals_matches_unsharded():
    """Sharding must stay bitwise-neutral for the pair kernel's dual
    stitch: 8-shard fused_nl (stacked, dual fixture) vs single-device."""
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.models.common3d import grid_arrays, init_state
    from cmcfs_tpu.core.params import FluidParams
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    grid = _baffled_cavity(32, 19, 21)
    ga = grid_arrays(grid)
    assert ga.cls_b[0] is not None
    cur = init_state(grid)
    p = FluidParams.normalized(200.0, 0.72, 1.4)
    pa = adi3d.ParamsArgs3D(*[jnp.float32(x) for x in
                              (p.v_T, p.v_vis, p.t_vis, p.t_phi,
                               grid.dx, grid.dy, grid.dz)])
    dt = jnp.float32(0.01)
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    is_in = np.asarray(ga.types) == NodeType.IN
    mo = tuple(bool(((np.asarray(ga.cls_a[ax]) == INTERIOR)
                     == is_in).all()) for ax in range(3))
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)

    ref, sh = cur, cur_s
    for _ in range(2):
        ref, _ = adi3d.adi_timestep_3d(ref, ref, ga, dt, 2, 2, pa,
                                       backend="fused_nl",
                                       compute_error=False, merge_ok=mo)
        sh, _ = adi3d.adi_timestep_3d(sh, sh, ga_s, dt, 2, 2, pa,
                                      backend="fused_nl",
                                      compute_error=False, merge_ok=mo,
                                      plan=plan)
    for r, s in zip(ref, sh):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=0, atol=5e-7)


@pytest.mark.skipif(os.environ.get("CMCFS_LONG") != "1",
                    reason="gated long tier (CMCFS_LONG=1)")
@pytest.mark.parametrize("backend,nl", [("fused_nl", 4),
                                        ("fused_bf16", 2),
                                        ("fused_pcr", 2)])
def test_sharded_nl_stacked_carry_bitwise_long(backend, nl):
    """Gated-tier widening of test_sharded_nl_stacked_carry_bitwise: the
    chained-pair seam (nl=4 — halos re-exchanged per pair), the bf16
    staging dtypes, and the pcr 4-slot staging, all under the sharded
    stacked step."""
    _sharded_stacked_bitwise(backend, nl)


def test_sharded_nl_targeted_bitwise():
    """The round-5 sharded targeted-layout step (every direction's final
    pair kernel writes out/tn in the consumer's kernel layout, per shard,
    via _nl_targeted_sharded_call) must be BITWISE equal to (a) the plain
    sharded stacked step and (b) the single-chip targeted step — the
    reference's multi-GPU path runs the identical hot kernels as its
    single-GPU path (AdiSolver3D.cu:376-404); this pins that we now do
    too.  NOTE the flag flips call adi_timestep_3d EAGERLY: its
    clear_cache() does re-trace eager calls, but does NOT invalidate the
    nested-jaxpr cache under an outer jax.jit (jax.clear_caches() would
    be needed there)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(32, 19, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    assert all(merge_ok)
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)

    rep = adi3d.dispatch_report(cur.u.shape, ga, "fused_nl", 2, merge_ok,
                                plan)
    assert rep["stacked"] and rep["targeted"], rep

    saved = adi3d.NL_TARGETED
    outs = {}
    try:
        for flag in (True, False):
            adi3d.NL_TARGETED = flag
            adi3d.adi_timestep_3d.clear_cache()
            sh = cur_s
            for _ in range(2):
                sh, _ = adi3d.adi_timestep_3d(sh, sh, ga_s, dt, 2, 2, pa,
                                              backend="fused_nl",
                                              compute_error=False,
                                              merge_ok=merge_ok, plan=plan)
            outs[flag] = sh
        adi3d.NL_TARGETED = True
        adi3d.adi_timestep_3d.clear_cache()
        ref = cur
        for _ in range(2):
            ref, _ = adi3d.adi_timestep_3d(ref, ref, ga, dt, 2, 2, pa,
                                           backend="fused_nl",
                                           compute_error=False,
                                           merge_ok=merge_ok)
    finally:
        adi3d.NL_TARGETED = saved
        adi3d.adi_timestep_3d.clear_cache()
    for a, b in zip(outs[True], outs[False]):
        assert (np.asarray(a) == np.asarray(b)).all(), \
            "sharded targeted != sharded plain stacked"
    for a, r in zip(outs[True], ref):
        assert (np.asarray(a) == np.asarray(r)).all(), \
            "sharded targeted != single-chip targeted"


def test_sharded_nl_stacked_collective_budget():
    """Compiler-level pin of the sharded stacked step's communication
    structure: entering/leaving L_X reshards once each per global
    iteration (all_to_alls ride the resharding of the X direction's
    lines), halos move via collective-permute, and NOTHING gets
    all-gathered (an all-gather would mean GSPMD fell back to
    rematerializing a replicated field — the exact regression this test
    exists to catch)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(32, 16, 16, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    ng = 2

    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    rep = adi3d.dispatch_report(cur.u.shape, ga, "fused_nl", 2,
                                merge_ok, plan)
    assert rep["stacked"] and rep["targeted"], rep

    def step(c):
        new, _ = adi3d.adi_timestep_3d(c, c, ga_s, dt, ng, 2, pa,
                                       backend="fused_nl",
                                       compute_error=False,
                                       merge_ok=merge_ok, plan=plan)
        return new

    hlo = jax.jit(step).lower(cur_s).compile().as_text()
    n_a2a = hlo.count(" all-to-all")
    n_ag = hlo.count(" all-gather")
    # The default sharded program is the TARGETED stacked step (round 5).
    # Its communication structure: the X->Z handoff is collective-free
    # (X's kernel j-dim = grid Y = exactly Z's wanted sharding); the
    # Z->Y and Y->X transitions each move the out/tn stacks one
    # all_to_all (the shard axis must leave the new solve axis — the
    # same structural transpose-exchange as the reference's multi-GPU
    # path), plus entry seeding (L_X state -> L_Z), exit, the CSE'd
    # loop-invariant direction masks, and the final canonical-split
    # constraint.  Measured on this fixture at ng=2: 17 all-to-alls /
    # 44 collective-permutes (vs 9/40 for the plain stacked step, whose
    # fewer-but-fatter reshards come WITH 7 XLA relayout copies per
    # iteration that targeted eliminates — the r4 silicon A/B's -24%),
    # and 27 for the r3 per-direction path.  An all-gather would mean
    # GSPMD rematerialized a replicated field — the regression this
    # test exists to catch.
    assert 1 <= n_a2a <= 6 * ng + 6, n_a2a
    assert n_ag == 0, "unexpected all-gather in the stacked sharded step"


def test_step_pad_plan_aware_decision():
    """_step_pad under a plan (round-5, VERDICT #5): pads must keep shard
    divisibility — x stays evenly split (the set_plan invariant) and y
    splits for the stacked/targeted reshard — via lcm(tile, n_shards)
    targets.  Reference analog: AlignBy32 + ``align`` exist precisely so
    multi-GPU slabs stay aligned (Geometry.h:564-568)."""
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    plan = make_x_mesh(8)
    # the VERDICT's 255^3-class case: one plane shy of aligned everywhere
    assert adi3d._step_pad((255, 255, 255), "fused_nl", None) == (1, 1, 1)
    pad = adi3d._step_pad((255, 255, 255), "fused_nl", plan)
    assert pad == (1, 1, 1), pad
    for s, p, t in zip((255, 255, 255), pad, (8, 128, 128)):
        assert (s + p) % t == 0 and (s + p) % 8 == 0   # tile AND 8 shards
    # non-fused backends and far-from-aligned grids stay unpadded
    assert adi3d._step_pad((255, 255, 255), "scan", plan) is None
    assert adi3d._step_pad((32, 19, 21), "fused_nl", plan) is None


def test_sharded_step_pad_bitwise(monkeypatch):
    """Sharded execution of the step-level pad (pad != None under a plan):
    pair kernels run on the padded stacked step, padded cells are identity
    rows, result bitwise vs the unpadded scan path.  _STEP_TILES is scaled
    to (8, 16, 16) because at the real 128-lane tiles any CPU-sized
    fixture trips the 1.25x growth guard (the decision logic at real
    tiles is pinned by test_step_pad_plan_aware_decision)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    # x=40: evenly sharded over 8 (the set_plan invariant — device_put
    # refuses uneven splits, and cli padding guarantees divisibility
    # before any plan run); y/z=15 carry the tile pads
    monkeypatch.setattr(adi3d, "_STEP_TILES", (8, 16, 16))
    _, ga, cur, pa = g._setup(40, 15, 15, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    rep = adi3d.dispatch_report(cur.u.shape, ga, "fused_nl", 2, merge_ok,
                                plan)
    assert rep["pad"] == (0, 1, 1), rep
    assert rep["stacked"] and rep["dirs"]["X"] == "pair", rep

    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    adi3d.adi_timestep_3d.clear_cache()
    try:
        sh, _ = adi3d.adi_timestep_3d(cur_s, cur_s, ga_s, dt, 2, 2, pa,
                                      backend="fused_nl",
                                      compute_error=False,
                                      merge_ok=merge_ok, plan=plan)
        ref, _ = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                       backend="scan",
                                       compute_error=False,
                                       merge_ok=merge_ok)
    finally:
        adi3d.adi_timestep_3d.clear_cache()
    for r, o in zip(ref, sh):
        # in-kernel RHS build is mul-by-reciprocal vs XLA div on the
        # interpreter (~1 ulp, bitwise on TPU) — same bound as the other
        # fused-vs-scan cross-checks
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-7)


def test_sharded_nl_odd_tail_matches_unsharded():
    """Sharded fused_nl at num_local=3 — the mixed dispatch: Y/Z run one
    pair + a stream-kernel tail per shard, X falls back to the
    per-iteration fused_dma reshard path (odd num_local cannot pair on
    resharded lines)."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.core.types import NodeType
    from cmcfs_tpu.ops.masks import INTERIOR
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(32, 19, 21, "scan")
    is_in = np.asarray(ga.types) == NodeType.IN
    merge_ok = tuple(
        bool(((np.asarray(ga.cls_a[ax]) == INTERIOR) == is_in).all())
        for ax in range(3))
    dt = jnp.float32(0.01)

    plan = make_x_mesh(8)
    ref, _ = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, 3, pa,
                                   backend="fused_nl", compute_error=False,
                                   merge_ok=merge_ok)
    sh, _ = adi3d.adi_timestep_3d(plan.shard_state(cur),
                                  plan.shard_state(cur),
                                  plan.shard_grid(ga), dt, 1, 3, pa,
                                  backend="fused_nl", compute_error=False,
                                  merge_ok=merge_ok, plan=plan)
    for r, s in zip(ref, sh):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=0, atol=5e-7)


def test_sharded_long_line_fused_matches_scan():
    """Sweeps beyond the VMEM line cap (>288) keep the fused path under a
    mesh: the chunked long-line kernel runs per shard (Y/Z) and after the
    all_to_all reshard (X) — the 512^3-class 2+-chip regime's hot path."""
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d
    from cmcfs_tpu.parallel.mesh import make_x_mesh

    _, ga, cur, pa = g._setup(320, 16, 16, "scan")
    dt = jnp.float32(0.01)
    plan = make_x_mesh(8)
    cur_s = plan.shard_state(cur)
    ga_s = plan.shard_grid(ga)
    sh, _ = adi3d.adi_timestep_3d(cur_s, cur_s, ga_s, dt, 1, 1, pa,
                                  backend="fused_dma", compute_error=False,
                                  plan=plan)
    sc, _ = adi3d.adi_timestep_3d(cur_s, cur_s, ga_s, dt, 1, 1, pa,
                                  backend="scan", compute_error=False,
                                  plan=plan)
    un, _ = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, 1, pa,
                                  backend="fused_dma", compute_error=False)
    for a, b in zip(sh, sc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(sh, un):
        # per-shard padding regroups interpret-mode FMAs: ~1 ulp
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-7)
