"""All 3D solver backends must agree with the exact-order scan on one full
step (CPU: Pallas interpreter; on TPU the fused family is bitwise)."""
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


@pytest.mark.parametrize("backend", ["fused", "fused_dma", "fused_merge",
                                     "fused_full", "fused_nl"])
def test_backend_matches_scan(backend):
    adi3d, ga, cur, pa, merge_ok = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend=backend, exact=True,
                                    compute_error=True, merge_ok=merge_ok)
    for r, o in zip(ref, out):
        # interpret-mode FMA contraction costs ~1 ulp on CPU (bitwise on TPU)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-7)
    assert abs(float(e0) - float(e1)) < 1e-9


def test_pcr_backend_close_to_scan():
    """backend="pcr" runs the full step on the log-depth cyclic-reduction
    solver (generic row path).  Not bitwise (different elimination order)
    but the ADI rows are strongly diagonally dominant: measured max
    per-field drift ~7e-7 after a 2x2-iteration step."""
    adi3d, ga, cur, pa, _ = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="pcr", exact=True,
                                    compute_error=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-6)
    assert abs(float(e0) - float(e1)) < 1e-6


def test_fused_pcr_close_to_scan():
    """backend="fused_pcr" = the num_local-pair kernel with the serial
    Thomas row loops replaced by in-kernel parallel cyclic reduction
    (ops/pallas_sweep_nl.py pcr mode — the ROOFLINE §3 recurrence attack).
    Not bitwise (different elimination order), but the ADI rows are
    strongly diagonally dominant — same drift class as backend="pcr"."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="fused_pcr", exact=True,
                                    compute_error=True, merge_ok=merge_ok)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-6)
    assert abs(float(e0) - float(e1)) < 1e-6


def test_fused_pcr_non_pow2_sweep():
    """The PCR levels must handle non-power-of-two sweep lengths (the
    out-of-range shift fills act as identity-row neighbors, as in
    ops/tridiag._solve_leading_axis_pcr): direct single-direction pair
    solve on an n=40 X sweep vs the serial pair kernel."""
    import __graft_entry__ as g
    from cmcfs_tpu.models.common3d import State3D
    adi3d, ga, cur, pa = g._setup(40, 19, 21, "scan")
    dt = jnp.float32(0.01)
    out0 = State3D(*(jnp.zeros_like(f) for f in cur))
    t_s, o_s = adi3d._solve_nl_fused(0, cur, cur, out0, ga, dt, pa,
                                     exact=True)
    t_p, o_p = adi3d._solve_nl_fused(0, cur, cur, out0, ga, dt, pa,
                                     exact=True, pcr=True)
    for r, o in zip(tuple(t_s) + tuple(o_s), tuple(t_p) + tuple(o_p)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=5e-6)


def test_fused_pcr_bf16_close_to_f32():
    """The combined mode (bf16 payload storage x in-kernel PCR) — on
    spec-bandwidth silicon the projected fastest configuration; must stay
    within bf16 resolution of the exact solve (PCR's ulp-class drift is
    negligible against the bf16 storage rounding)."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="fused_pcr_bf16", exact=True,
                                    compute_error=True, merge_ok=merge_ok)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=0.02)
    assert np.isfinite(float(e1))
    assert abs(float(e0) - float(e1)) < 0.01


def test_bf16_storage_close_to_f32():
    """fused_bf16 (bf16 kernel storage, f32 Thomas): the non-parity fast
    path must stay within bf16 resolution of the exact solve."""
    adi3d, ga, cur, pa, _ = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="fused_bf16", exact=True,
                                    compute_error=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=0.02)
    assert np.isfinite(float(e1))
    assert abs(float(e0) - float(e1)) < 0.01


def test_bf16_stream_path_close_to_f32():
    """fused_bf16 prefers the streamed full-fusion kernel when the merge
    guarantees hold (bf16 rhs/out payloads, f32 compute, f32 temp/BCs) —
    must stay within bf16 resolution of the exact solve."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    if not any(merge_ok):
        pytest.skip("fixture has no merge-foldable axis")
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="fused_bf16", exact=True,
                                    compute_error=True, merge_ok=merge_ok)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=0.02)
    assert np.isfinite(float(e1))
    assert abs(float(e0) - float(e1)) < 0.01


def test_bf16_horizon_guardrail():
    """fused_bf16 is a bounded-horizon mode: the CLI must warn on long
    trajectories (measured drift table, RESULTS.md) and stay silent for
    short runs and for the f32 parity backends."""
    from cmcfs_tpu.cli3d import bf16_horizon_warning, BF16_STEP_WARN_THRESHOLD
    assert bf16_horizon_warning("fused_bf16", BF16_STEP_WARN_THRESHOLD + 1)
    assert "fused_bf16" in bf16_horizon_warning("fused_bf16", 1000)
    assert bf16_horizon_warning("fused_bf16", 10) is None
    assert bf16_horizon_warning("fused_full", 100000) is None
    assert bf16_horizon_warning("scan", 100000) is None


def test_profiled_step_matches_plain():
    """The per-direction profiled step (reference event table,
    Profiler.h:44-134) must produce the same state as the fused one-jit
    step and record every reference event name."""
    import jax.numpy as jnp
    from cmcfs_tpu.utils.profiler import Profiler

    adi3d, ga, cur, pa, merge_ok = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 2, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True, merge_ok=merge_ok)
    prof = Profiler(sync=False)
    out, e1 = adi3d.adi_timestep_3d_profiled(cur, cur, ga, dt, 2, 2, pa,
                                             prof, backend="scan",
                                             exact=True, merge_ok=merge_ok)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    assert abs(float(e0) - e1) < 1e-12
    for name in ("CopyLayer", "SolveSegments_Z", "SolveSegments_Y",
                 "SolveSegments_X", "MergeLayer", "EvalDivError"):
        assert name in prof.events, name
    assert prof.events["SolveSegments_X"].count == 2


def test_fused_nl_chained_pairs_and_odd_tail():
    """num_local=4 (two chained pair-kernel invocations) and num_local=3
    (pair + trailing per-iteration stream call) must match scan — covers
    the pair chaining and the no-gmerge odd tail."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    dt = jnp.float32(0.01)
    for nl in (4, 3):
        ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, nl, pa,
                                        backend="scan", exact=True,
                                        compute_error=True)
        out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, nl, pa,
                                        backend="fused_nl", exact=True,
                                        compute_error=True,
                                        merge_ok=merge_ok)
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=0, atol=5e-7)
        assert abs(float(e0) - float(e1)) < 1e-9


def test_nl_stacked_carry_bitwise():
    """The stacked-carry step (adi3d.NL_STACKED: 4-var stacks carried in
    kernel layouts across the whole step) feeds the pair kernels
    bit-identical operands, so it must be BITWISE equal to the
    per-direction path — this is also the only coverage of the unsharded
    per-direction xmode path at even num_local once stacked is default."""
    import jax
    adi3d, ga, cur, pa, merge_ok = _setup()
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    saved = adi3d.NL_STACKED
    try:
        outs = {}
        for flag in (False, True):
            adi3d.NL_STACKED = flag
            adi3d.adi_timestep_3d.clear_cache()
            outs[flag], _ = adi3d.adi_timestep_3d(
                cur, cur, ga, dt, 2, 2, pa, backend="fused_nl", exact=True,
                compute_error=False, merge_ok=merge_ok)
        assert adi3d.dispatch_report(cur.u.shape, ga, "fused_nl", 2,
                                     merge_ok)["stacked"]
        for r, o in zip(outs[False], outs[True]):
            assert (np.asarray(o) == np.asarray(r)).all()
    finally:
        adi3d.NL_STACKED = saved
        adi3d.adi_timestep_3d.clear_cache()


@pytest.mark.parametrize("backend,nl", [("fused_nl", 2), ("fused_nl", 4),
                                        ("fused_bf16", 2),
                                        ("fused_pcr", 2)])
def test_nl_targeted_layout_writes_bitwise(backend, nl):
    """The targeted-layout stacked step (adi3d.NL_TARGETED: each
    direction's pair kernel writes out/tn directly in the consuming
    direction's kernel layout, dual writes for dual-consumer outputs,
    Z layout flipped to (z,y,x) with swap_cross) feeds the kernels
    bit-identical per-cell operands, so it must be BITWISE equal to the
    plain stacked path — covering the permuted-slice DMAs, the in-VMEM
    slab transposes, the chained-pair identity prefix (nl=4), the bf16
    staging dtypes, and the pcr 4-slot staging."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    if not all(merge_ok):
        pytest.skip("fixture has a non-foldable axis")
    dt = jnp.float32(0.01)
    saved = adi3d.NL_TARGETED
    try:
        outs = {}
        for flag in (False, True):
            adi3d.NL_TARGETED = flag
            adi3d.adi_timestep_3d.clear_cache()
            outs[flag], _ = adi3d.adi_timestep_3d(
                cur, cur, ga, dt, 2, nl, pa, backend=backend, exact=True,
                compute_error=False, merge_ok=merge_ok)
        assert adi3d.dispatch_report(cur.u.shape, ga, backend, nl,
                                     merge_ok)["stacked"]
        for r, o in zip(outs[False], outs[True]):
            assert (np.asarray(o) == np.asarray(r)).all()
    finally:
        adi3d.NL_TARGETED = saved
        adi3d.adi_timestep_3d.clear_cache()


def test_fused_nl_sweep1_routing_matches_scan():
    """The pair kernel's sweep_axis=1 Y/Z routing (adi3d.NL_XMODE=False —
    the pre-xmode default, kept as the escape hatch) stays correct: with
    the xmode default on, nothing else exercises that kernel layout."""
    adi3d, ga, cur, pa, merge_ok = _setup()
    dt = jnp.float32(0.01)
    ref, e0 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, 2, pa,
                                    backend="scan", exact=True,
                                    compute_error=True)
    saved = adi3d.NL_XMODE
    adi3d.adi_timestep_3d.clear_cache()
    try:
        adi3d.NL_XMODE = False
        out, e1 = adi3d.adi_timestep_3d(cur, cur, ga, dt, 1, 2, pa,
                                        backend="fused_nl", exact=True,
                                        compute_error=True,
                                        merge_ok=merge_ok)
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=0, atol=5e-7)
        assert abs(float(e0) - float(e1)) < 1e-9
    finally:
        adi3d.NL_XMODE = saved
        adi3d.adi_timestep_3d.clear_cache()
