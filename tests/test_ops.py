import numpy as np
import pytest

from cmcfs_tpu.core.types import NodeType
from cmcfs_tpu.ops import masks
from cmcfs_tpu.ops.masks import IDENTITY, BC0, BC1, INTERIOR

I, O, B, V = NodeType.IN, NodeType.OUT, NodeType.BOUND, NodeType.VALVE


def ref_scan_2d(line):
    """Direct transcription of the reference scan (AdiSolver2D.cpp:228-277)."""
    N = len(line)
    j = 0
    while j < N and line[j] == O:
        j += 1
    while j + 1 < N and line[j + 1] != I:
        j += 1
    if j + 1 >= N:
        return None
    start = j
    j = N - 1
    while j >= 0 and line[j] == O:
        j -= 1
    while j - 1 >= 0 and line[j - 1] != I:
        j -= 1
    return start, j


def cls_from_ref_2d(line):
    cls = np.zeros(len(line), dtype=np.int8)
    seg = ref_scan_2d(line)
    if seg is None or seg[1] < seg[0]:
        return cls
    s, e = seg
    cls[s + 1:e] = INTERIOR
    cls[s] = BC0
    cls[e] = BC1
    return cls


@pytest.mark.parametrize("line", [
    [O, O, B, I, I, I, B, O],
    [O, B, I, I, V, I, I, B, O],     # mid-line non-IN cell: still interior row (2D quirk)
    [O, O, O, O],
    [O, B, O, O],
    [B, I, I, B],
    [O, O, B, B, I, I, B, B, O],
    [O, V, I, I, I, V, O],
])
def test_line_class_2d_matches_reference_scan(line):
    t = np.array([line], dtype=np.int8)
    cls = masks.line_class_2d(t, axis=1)[0]
    np.testing.assert_array_equal(cls, cls_from_ref_2d(line))


def ref_scan_3d(line):
    """Transcription of Grid3D::GenerateListSegments (Grid3D.cpp:47-127)."""
    segs = []
    N = len(line)
    state = 0
    pos = 0
    seg_start = None
    for q in range(1, N):
        if line[q] == I:
            if state == 0:
                seg_start = q - 1
                state = 1
        else:
            if state == 1:
                segs.append((seg_start, q))
                state = 0
    return segs


def cls_from_ref_3d(line):
    cls = np.zeros(len(line), dtype=np.int8)
    for s, e in ref_scan_3d(line):
        cls[s + 1:e] = INTERIOR
        cls[s] = BC0      # may overwrite previous seg's BC1 at a shared cell
        cls[e] = BC1
    return cls


@pytest.mark.parametrize("line", [
    [O, B, I, I, B, O],
    [O, B, I, I, B, B, I, I, B, O],   # two runs, 2-thick wall
    [O, B, I, B, I, B, O],            # single-cell runs
    [O, B, I, I, I],                  # run touches the end: dropped
    [I, I, B, O],                     # run starts at cell 0: cell 0 is the endpoint
    [O, O, O],
])
def test_line_class_3d_runs(line):
    t = np.array([line], dtype=np.int8)
    lc = masks.line_class_3d(t, axis=1)
    segs = ref_scan_3d(line)
    cls = lc.cls_a[0]
    interior = set()
    for s, e in segs:
        interior |= set(range(s + 1, e))
    for p, ty in enumerate(line):
        if p in interior:
            assert cls[p] == INTERIOR, (p, line)
        elif any(p == s for s, _ in segs) and not any(p == e for _, e in segs):
            assert cls[p] == BC0, (p, line)
        elif any(p == e for _, e in segs) and not any(p == s for s, _ in segs):
            assert cls[p] == BC1, (p, line)
        elif any(p == s for s, _ in segs) and any(p == e for _, e in segs):
            # dual cell: pass A takes END role, pass B START role
            assert cls[p] == BC1
            assert lc.cls_b is not None and lc.cls_b[0][p] == BC0
        else:
            assert cls[p] == IDENTITY, (p, line)


def test_line_class_3d_dual_cell():
    line = [O, B, I, I, B, I, I, B, O]   # 1-thick wall between two runs
    t = np.array([line], dtype=np.int8)
    lc = masks.line_class_3d(t, axis=1)
    assert lc.cls_b is not None
    # pass B owns: the dual cell (4), the right run (5, 6) and its end (7)
    expect_take = [False] * 9
    for p in (4, 5, 6, 7):
        expect_take[p] = True
    np.testing.assert_array_equal(lc.take_b[0], expect_take)


def test_tridiag_matches_dense_solve():
    import jax.numpy as jnp
    from cmcfs_tpu.ops.tridiag import tridiag_solve
    rng = np.random.default_rng(0)
    N, batch = 17, 5
    a = rng.normal(size=(N, batch)).astype(np.float32)
    b = (rng.normal(size=(N, batch)) + 6.0).astype(np.float32)  # diag dominant
    c = rng.normal(size=(N, batch)).astype(np.float32)
    d = rng.normal(size=(N, batch)).astype(np.float32)
    x = np.asarray(tridiag_solve(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d),
                                 backend="scan"))
    for k in range(batch):
        M = np.zeros((N, N))
        for i in range(N):
            M[i, i] = b[i, k]
            if i > 0:
                M[i, i - 1] = a[i, k]
            if i < N - 1:
                M[i, i + 1] = c[i, k]
        ref = np.linalg.solve(M, d[:, k])
        np.testing.assert_allclose(x[:, k], ref, rtol=2e-3, atol=2e-4)


def test_tridiag_block_decoupling():
    """Identity/BC rows must decouple blocks exactly like separate solves."""
    import jax.numpy as jnp
    from cmcfs_tpu.ops.tridiag import tridiag_solve
    rng = np.random.default_rng(1)
    # two blocks [0..4] and [7..11] separated by identity rows 5, 6
    N = 12
    a = rng.normal(size=(N, 1)).astype(np.float32)
    b = (rng.normal(size=(N, 1)) + 5.0).astype(np.float32)
    c = rng.normal(size=(N, 1)).astype(np.float32)
    d = rng.normal(size=(N, 1)).astype(np.float32)
    for p in (5, 6):
        a[p] = 0; b[p] = 1; c[p] = 0; d[p] = 0
    a[0] = 0; c[4] = 0       # block edges: BC0 has no a, BC1 has no c
    a[7] = 0; c[11] = 0
    x_full = np.asarray(tridiag_solve(*map(jnp.array, (a, b, c, d)), backend="scan"))
    x0 = np.asarray(tridiag_solve(*map(jnp.array, (a[:5], b[:5], c[:5], d[:5])),
                                  backend="scan"))
    x1 = np.asarray(tridiag_solve(*map(jnp.array, (a[7:], b[7:], c[7:], d[7:])),
                                  backend="scan"))
    np.testing.assert_array_equal(x_full[:5], x0)
    np.testing.assert_array_equal(x_full[7:], x1)
    np.testing.assert_array_equal(x_full[5:7], np.zeros((2, 1), np.float32))


def test_tridiag_pcr_solves_and_decouples():
    """Parallel cyclic reduction: log-depth solver for recurrence-bound
    silicon (docs/ROOFLINE.md §3).  Must solve the system (checked by
    residual, not by agreement with Thomas — the elimination order
    differs) and decouple identity-separated blocks like the masked-line
    formulation requires."""
    import jax.numpy as jnp
    from cmcfs_tpu.ops.tridiag import tridiag_solve
    rng = np.random.default_rng(3)
    N, batch = 53, 64          # non-power-of-two length
    a = rng.normal(size=(N, batch)).astype(np.float32)
    c = rng.normal(size=(N, batch)).astype(np.float32)
    b = (np.abs(a) + np.abs(c) + 1.0
         + rng.uniform(0, 1, (N, batch))).astype(np.float32)
    d = rng.normal(size=(N, batch)).astype(np.float32)
    for p in (0, 19, 20, 40):  # identity rows: two decoupled interior blocks
        a[p] = 0; b[p] = 1; c[p] = 0
    for exact in (True, False):
        x = np.asarray(tridiag_solve(*map(jnp.array, (a, b, c, d)),
                                     backend="pcr", exact=exact))
        cc = c.copy()
        cc[-1] = 0            # reference Algorithms.h:23
        r = b * x
        r[1:] += a[1:] * x[:-1]
        r[:-1] += cc[:-1] * x[1:]
        np.testing.assert_allclose(r, d, rtol=0, atol=5e-6)
    # identity rows return their own d (here: d as written, decoupled)
    x = np.asarray(tridiag_solve(*map(jnp.array, (a, b, c, d)),
                                 backend="pcr"))
    np.testing.assert_allclose(x[19:21], d[19:21], rtol=0, atol=1e-6)


def test_tridiag_pallas_interpret_matches_scan():
    import jax
    import jax.numpy as jnp
    from cmcfs_tpu.ops.tridiag import tridiag_solve
    from cmcfs_tpu.ops import pallas_tridiag as pt
    rng = np.random.default_rng(2)
    N, batch = 19, 200   # deliberately unaligned -> exercises padding
    a = rng.normal(size=(N, batch)).astype(np.float32)
    b = (rng.normal(size=(N, batch)) + 6.0).astype(np.float32)
    c = rng.normal(size=(N, batch)).astype(np.float32)
    d = rng.normal(size=(N, batch)).astype(np.float32)
    x_scan = np.asarray(tridiag_solve(*map(jnp.array, (a, b, c, d)), backend="scan"))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        x_pl = np.asarray(pt.tridiag_pallas(*map(jnp.array, (a, b, c, d)),
                                            n_tile=8, s_tile=8))
    np.testing.assert_allclose(x_pl, x_scan, rtol=1e-6, atol=1e-6)


def test_fused_sweep_long_matches_fused():
    """Chunked long-line kernel (ops/pallas_sweep_long.py) == the
    VMEM-resident kernel bitwise, across chunk counts and both axes,
    in BOTH residency regimes: the default (the round-5 resident ring
    holds every chunk — no staging) and a squeezed-VMEM run where the
    ring falls back to depth 2 and early chunks round-trip through the
    HBM staging (the only interpreter coverage of the stage-out /
    re-stream machinery once real budgets keep everything resident)."""
    import jax.numpy as jnp
    from cmcfs_tpu.ops.pallas_sweep import fused_sweep
    from cmcfs_tpu.ops import pallas_sweep_long
    from cmcfs_tpu.ops.pallas_sweep_long import fused_sweep_long
    from cmcfs_tpu.ops import masks
    from cmcfs_tpu.geom.synthetic import lid_cavity_3d

    grid = lid_cavity_3d(40, 48, 20)
    t = grid.types
    rng = np.random.default_rng(0)
    adv = jnp.asarray(rng.normal(size=t.shape).astype(np.float32) * 0.1)
    d4 = jnp.asarray(rng.normal(size=(4,) + t.shape).astype(np.float32))
    scal = jnp.asarray([2.0, 1.5, 30.0, 5.0], jnp.float32)
    bcv = jnp.asarray(grid.bc_vel)
    bct = jnp.asarray(grid.bc_temp)
    saved_budget = pallas_sweep_long.VMEM_BUDGET
    try:
        for ax in (0, 1):
            lc = masks.line_class_3d(t, axis=ax)
            cls = jnp.asarray(lc.cls_a)
            interior = cls == masks.INTERIOR
            isbc = (cls == masks.BC0) | (cls == masks.BC1)
            d4f = jnp.where(interior | isbc, d4, 0.0)
            ref = np.asarray(fused_sweep(adv, cls, bcv, bct, d4f, scal,
                                         sweep_axis=ax, exact=True))
            # (chunk, budget): None = real budget (all chunks resident;
            # chunk 48 additionally covers the single-chunk n_res=1 case);
            # budget 1 squeezes the ring to depth 2 so chunk 16's 3-chunk
            # split stages its first chunk through HBM
            for chunk, budget in ((16, None), (24, None), (48, None),
                                  (16, 1)):
                pallas_sweep_long.VMEM_BUDGET = (saved_budget
                                                 if budget is None
                                                 else budget)
                fused_sweep_long.clear_cache()   # budget read at trace time
                x = fused_sweep_long(adv, cls, bcv, bct, d4f, scal,
                                     sweep_axis=ax, exact=True, chunk=chunk)
                np.testing.assert_array_equal(np.asarray(x), ref)
    finally:
        pallas_sweep_long.VMEM_BUDGET = saved_budget
        fused_sweep_long.clear_cache()
