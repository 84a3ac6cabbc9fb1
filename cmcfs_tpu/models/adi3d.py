"""3D ADI solver — dense masked reformulation of the reference scheme.

Numerics replicate src/FluidSolver3D/AdiSolver3D.cpp:
  * per global iteration: Z sweep (RHS cur -> next), Y sweep (next -> half),
    X sweep (half -> next)  [TimeStep :335-344],
  * per direction: ``num_local`` inner iterations, each followed by
    temp <- average(temp, out) on NODE_IN cells  [SolveDirection :587-655 —
    the 3D scheme always merges, unlike 2D's copy-then-merge],
  * after each global iteration: temp <- average(temp, next) on IN cells,
  * interior rows a = -q/(2h) - nu/h^2, b = 3/dt + 2 nu/h^2,
    c = q/(2h) - nu/h^2, RHS = cur*3/dt + forcing  [BuildMatrix :732-802],
  * boundary rows: Dirichlet f=value, or free extrapolation rows
    (2, -1 | -1, 2)  [ApplyBC0/1 :804-852],
  * divergence metric of TimeLayer3D.h:595-641 (checked on demand).

Segments never exist: each direction is one batched full-width tridiagonal
solve with identity rows decoupling the runs (ops/masks.py).  Where a single
non-IN cell separates two fluid runs (dual endpoint), the solve runs twice
with the two row assignments and the results are stitched per the reference's
write order.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import NodeType, BCtype
from ..ops import stencil
from ..ops.masks import BC0, BC1, INTERIOR
from ..ops.tridiag import tridiag_solve
from .common3d import State3D, GridArrays3D

ERR_THRESHOLD = 0.01       # reference AdiSolver3D.h:32

# fused_nl Y/Z directions run the sweep_axis=0 kernel on transposed
# operands: the sweep dim becomes the slab major dim, so the serial row
# loop reads whole (8,128) vreg tiles instead of gathering one sublane
# from each of 8 tiles, while the transposes fuse into the operand
# stacking copies that happen anyway.  Measured in-step (256^3 ng=4
# nl=2, scripts/probe_nl_xmode.py): 222.2 -> 187.5 ms/step, bitwise-
# identical.  Read at trace time; False restores the sweep_axis=1 path.
NL_XMODE = True

# Stacked-carry step: when EVERY direction runs the num_local-pair kernel
# (xmode, single chip, even num_local, no duals, merge_ok on all axes),
# carry the 4-var field stacks in each direction's KERNEL layout across
# the whole step — each operand is transposed exactly once per direction
# transition (7 relayouts per global iteration: 2 into Z, 2 into Y, 3
# into X) and the State3D unstack/restack between directions disappears.
# The kernels see bit-identical operands, so results are bitwise equal to
# the per-direction path (test_backends3d).  Read at trace time.
NL_STACKED = True

# Targeted-layout writes on the stacked-carry step: each direction's pair
# kernel writes out/tn DIRECTLY in the consuming direction's kernel layout
# (in-VMEM slab transposes + permuted-slice DMAs, dual writes for the
# dual-consumer next-layer outputs), killing the 7 XLA relayouts per
# global iteration entirely.  Default ON since round 4: the silicon A/B
# (bench_logs/ab_targeted_r4.log, 256^3 ng=4 nl=2) measured 56.2 vs 73.6
# ms/step (-24%) with a 0.00e+00 checksum delta — bitwise equal to the
# plain stacked step (test_backends3d).  Degrades itself (with a warning)
# when the kernels' VMEM request exceeds the Mosaic grant cap
# (_nl_targeted_vmem_ok — the pcr x targeted combination at 256^3).
# Read at trace time.
NL_TARGETED = True

# Carried-loop boundary-seed elision: the carried step's per-step re-seed
# (op = where(is_bv, cur-or-val, prev)) is a full-grid XLA pass (read 2
# fields + write 1) whose output only the step's FIRST Z pair kernel
# consumes.  On grids with NO FREE boundary condition anywhere on the
# BOUND/VALVE set, every bv cell's value is step-invariant: Dirichlet
# boundary rows write exactly d=val (_bc_rows_3d b=1,c=0), and cells the
# sweeps don't cover are merge-preserved from same-cell inputs — so both
# where branches hold bit-identical values and the pass is ELIDED
# (op = prev).  nl_carried_pre detects the condition; tests/test_carried
# pins multi-step bitwise equality and the FREE-case refusal.  Read at
# nl_carried_pre time.
NL_CARRIED_NOSEED = True

# Env overrides for the step-structure flags (CMCFS_NL_XMODE /
# CMCFS_NL_STACKED / CMCFS_NL_TARGETED / CMCFS_NL_CARRIED_NOSEED,
# "0"/"1") so gated modes are selectable per run without editing source —
# tests and A/B probes flip the module attributes directly instead
# (scripts/_nl_ab.py).
for _f in ("NL_XMODE", "NL_STACKED", "NL_TARGETED", "NL_CARRIED_NOSEED"):
    _v = os.environ.get("CMCFS_" + _f)
    if _v is not None:
        globals()[_f] = _v.strip().lower() not in ("", "0", "false")
del _f, _v


class ParamsArgs3D(NamedTuple):
    v_T: jnp.ndarray
    v_vis: jnp.ndarray
    t_vis: jnp.ndarray
    t_phi: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray


# xmode kernel layouts per physical direction (sweep dim major, the
# cross-derivative j-dim second, lanes last): X=(x,y,z), Y=(y,x,z),
# Z=(z,x,y) — the cyclic Z permutation keeps j=x, lanes=y, the same
# pairing as the legacy Z_as_Y path.  Shared by the per-direction calls
# (_solve_nl_fused) and the stacked-carry step (_nl_stacked_step) so the
# two paths can never diverge.
NL_PERM3 = {1: (1, 0, 2), 2: (2, 0, 1)}      # canonical -> kernel layout
NL_INV3 = {1: (1, 0, 2), 2: (1, 2, 0)}       # kernel layout -> canonical

# Targeted-layout call table, shared by _nl_stacked_step_targeted's
# run_dir invocations AND the _nl_targeted_vmem_ok grant checker (round-3
# advisor finding: a hardcoded copy in the checker could silently
# desynchronize from the step).  Per direction axis:
#   (operand layout perm from canonical (x,y,z),
#    out_perms of the direction's FINAL pair kernel, tn_perm).
# X's entry is its non-final-global variant — the VMEM worst case; the
# last-global X call writes identity layouts (strictly cheaper).
IDP3 = (0, 1, 2)
NL_TARGETED_CALLS = {
    2: ((2, 1, 0), ((1, 2, 0), (2, 1, 0)), (1, 2, 0)),   # Z @ L_Z=(z,y,x)
    1: ((1, 0, 2), (IDP3, (1, 0, 2)), (1, 0, 2)),        # Y @ L_Y=(y,x,z)
    0: (IDP3, ((2, 1, 0),), (2, 1, 0)),                  # X @ L_X
}


def _nl_scal(axis: int, pa: ParamsArgs3D, dt, swap_jl: bool = False):
    """The pair kernel's (8,) scal vector for a physical direction: the
    last two entries are the cross-axis derivative scales in the KERNEL's
    layout (j-dim, lane dim) — see NL_PERM3.  ``swap_jl``: the caller's
    layout swaps the two cross dims (the targeted stacked step's
    L_Z=(z,y,x)) — pairs with the kernel's swap_cross flag."""
    h = (pa.dx, pa.dy, pa.dz)[axis]
    hj, hl = {0: (pa.dy, pa.dz), 1: (pa.dx, pa.dz),
              2: (pa.dx, pa.dy)}[axis]
    if swap_jl:
        hj, hl = hl, hj
    return jnp.stack([pa.v_vis / (h * h), pa.t_vis / (h * h), 3.0 / dt,
                      1.0 / (2.0 * h), pa.v_T, pa.t_phi,
                      1.0 / (2.0 * hj), 1.0 / (2.0 * hl)])


def _sharded_fused(fused_sweep, plan, args3, d4, scal, kaxis: int,
                   exact: bool):
    """Run the fused sweep kernel per shard under shard_map.

    The reference runs its fused CUDA kernels inside the multi-GPU
    configuration (AdiSolver3D.cu:524-640); the TPU equivalent:

    * Y/Z sweeps — the sharded grid-X axis is a pure batch dim of the
      kernel, so every shard solves its own lines with zero communication;
    * X sweep — reshard the split onto the kernel's sublane batch dim
      (grid Y): an all_to_all over ICI (the TPU form of the reference's
      transpose option), then solve full-length lines locally, then
      reshard back to the canonical X split.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    ax = plan.axis
    n_sh = plan.mesh.shape[ax]
    pad = 0
    if kaxis == 0:
        # pad the to-be-sharded batch dim to divisibility; padded rows are
        # identity rows (cls 0, d 0) and are cropped after the solve
        B = args3[0].shape[1]
        pad = (-B) % n_sh
        if pad:
            p3 = ((0, 0), (0, pad), (0, 0))
            args3 = tuple(jnp.pad(m, p3) for m in args3)
            d4 = jnp.pad(d4, ((0, 0),) + p3)
        spec3 = P(None, ax, None)
    else:
        spec3 = P(ax, None, None)
    spec4 = P(None, *spec3)

    @functools.partial(jax.shard_map, mesh=plan.mesh,
                       in_specs=(spec3, spec3, spec3, spec3, spec4, P(None)),
                       out_specs=spec4, check_vma=False)
    def run(adv, cls, bcv, bct, d4_, scal_):
        return fused_sweep(adv, cls, bcv, bct, d4_, scal_,
                           sweep_axis=kaxis, exact=exact)

    x = run(*args3, d4, scal)
    if pad:
        x = x[:, :, :-pad]
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(plan.mesh, P(None, ax, None, None)))


def _bc_rows_3d(val, bc, free_code=BCtype.FREE):
    """3D boundary rows (ApplyBC0/1, AdiSolver3D.cpp:804-852)."""
    free = bc == free_code
    one = jnp.float32(1.0)
    two = jnp.float32(2.0)
    b0 = jnp.where(free, two, one)
    c0 = jnp.where(free, -one, 0.0)
    d0 = jnp.where(free, 0.0, val)
    a1 = jnp.where(free, -one, 0.0)
    b1 = jnp.where(free, two, one)
    d1 = jnp.where(free, 0.0, val)
    return b0, c0, d0, a1, b1, d1


def _build_and_solve_3d(axis: int, rhs: State3D, temp: State3D, ga: GridArrays3D,
                        dt, pa: ParamsArgs3D, backend: str, exact: bool,
                        plan=None) -> State3D:
    h = (pa.dx, pa.dy, pa.dz)[axis]
    adv = (temp.u, temp.v, temp.w)[axis]
    adv_2h = adv / (2.0 * h)
    inv3dt = 3.0 / dt

    v_vis_h2 = pa.v_vis / (h * h)
    t_vis_h2 = pa.t_vis / (h * h)

    grad_T = stencil.d1(temp.T, h, axis)
    if axis == 0:
        diss = stencil.diss_x_3d(temp.u, temp.v, temp.w, pa.dx, pa.dy, pa.dz)
    elif axis == 1:
        diss = stencil.diss_y_3d(temp.u, temp.v, temp.w, pa.dx, pa.dy, pa.dz)
    else:
        diss = stencil.diss_z_3d(temp.u, temp.v, temp.w, pa.dx, pa.dy, pa.dz)

    d_vars = []
    for vi, f in enumerate((rhs.u, rhs.v, rhs.w)):
        d = f * inv3dt
        if vi == axis:
            d = d - pa.v_T * grad_T
        d_vars.append(d)
    d_vars.append(rhs.T * inv3dt + pa.t_phi * diss)

    bc_vals = (ga.val_u, ga.val_v, ga.val_w, ga.val_T)
    bcs = (ga.bc_vel, ga.bc_vel, ga.bc_vel, ga.bc_temp)

    def build_d_folded(cls):
        """RHS arrays with the BC/identity d-values folded in."""
        interior = cls == INTERIOR
        is_bc0 = cls == BC0
        is_bc1 = cls == BC1
        ds = []
        for vi in range(4):
            free = bcs[vi] == BCtype.FREE
            d_bc = jnp.where(free, 0.0, bc_vals[vi])
            ds.append(jnp.where(interior, d_vars[vi],
                                jnp.where(is_bc0 | is_bc1, d_bc, 0.0)))
        return ds

    def sweep_scal():
        vis_h2 = pa.v_vis / (h * h)
        t_h2 = pa.t_vis / (h * h)
        return jnp.stack([vis_h2, t_h2, inv3dt, 1.0 / (2.0 * h)])

    def solve_fused(cls):
        """One fused build+solve kernel for all 4 vars (ops/pallas_sweep.py
        or the manual-DMA variant in ops/pallas_sweep_dma.py); under a mesh
        the same kernel runs per shard via shard_map."""
        use_bf16 = backend in ("fused_bf16", "fused_pcr_bf16")
        if n_sweep > 288:
            # beyond the VMEM cap: chunked sweep with HBM (c',d') staging
            # (bf16 d/x payload honored; carries stay f32).  Under a mesh it
            # runs per shard through the same shard_map wrapper — Y/Z shards
            # solve their own full-length lines, the X sweep reshards first
            # (so 512^3-class grids keep the fused path on 2+ chips)
            from ..ops.pallas_sweep_long import fused_sweep_long as fused_sweep
        elif backend in ("fused_dma", "fused_full", "fused_bf16",
                         "fused_nl", "fused_pcr", "fused_pcr_bf16"):
            from ..ops.pallas_sweep_dma import fused_sweep_dma as fused_sweep
            # bf16 storage mode: kernel HBM traffic halves; the Thomas
            # recurrence still runs in f32 inside the kernel (a TPU-native
            # speed/accuracy trade with no reference counterpart)
        else:
            from ..ops.pallas_sweep import fused_sweep
        ds = build_d_folded(cls)
        scal = sweep_scal()
        bcv = ga.bc_vel
        bct = ga.bc_temp
        if axis == 2:
            # Z_as_Y: swap axes 1<->2 around the kernel; XLA fuses these
            # transposes into the adjacent elementwise ops
            sw = lambda t: jnp.swapaxes(t, 1, 2)
            args3 = (sw(adv), sw(cls), sw(bcv), sw(bct))
            d4 = jnp.stack([sw(dd) for dd in ds])
            kaxis = 1
        else:
            args3 = (adv, cls, bcv, bct)
            d4 = jnp.stack(ds)
            kaxis = axis
        if use_bf16:
            # the cast fuses into the producing elementwise ops, so the RHS
            # only ever hits HBM as bf16 (the solution comes back bf16 too);
            # adv stays f32 — it is read straight from the temp fields
            d4 = d4.astype(jnp.bfloat16)
        if plan is None:
            x = fused_sweep(*args3, d4, scal, sweep_axis=kaxis, exact=exact)
        else:
            x = _sharded_fused(fused_sweep, plan, args3, d4, scal, kaxis,
                               exact)
        if use_bf16:
            x = x.astype(jnp.float32)
        return jnp.swapaxes(x, 2, 3) if axis == 2 else x

    def solve_with_cls(cls):
        interior = cls == INTERIOR
        is_bc0 = cls == BC0
        is_bc1 = cls == BC1

        def rows_for(vi):
            vis_h2 = t_vis_h2 if vi == 3 else v_vis_h2
            a_i = -adv_2h - vis_h2
            b_i = inv3dt + 2.0 * vis_h2
            c_i = adv_2h - vis_h2
            b0, c0, d0, a1, b1, d1 = _bc_rows_3d(bc_vals[vi], bcs[vi])
            a = jnp.where(interior, a_i, jnp.where(is_bc1, a1, 0.0))
            b = jnp.where(interior, b_i,
                          jnp.where(is_bc0, b0, jnp.where(is_bc1, b1, 1.0)))
            c = jnp.where(interior, c_i, jnp.where(is_bc0, c0, 0.0))
            d = jnp.where(interior, d_vars[vi],
                          jnp.where(is_bc0, d0, jnp.where(is_bc1, d1, 0.0)))
            return a, b, c, d

        if plan is None:
            # solve per variable: peak memory is one var's row arrays, which
            # keeps large single-chip grids (384^3+) inside HBM
            xs = []
            for vi in range(4):
                a, b, c, d = rows_for(vi)
                xs.append(tridiag_solve(a, b, c, d, axis=axis, exact=exact,
                                        backend=backend))
            return jnp.stack(xs)

        rows = [rows_for(vi) for vi in range(4)]
        a = jnp.stack([r[0] for r in rows])
        b = jnp.stack([r[1] for r in rows])
        c = jnp.stack([r[2] for r in rows])
        d = jnp.stack([r[3] for r in rows])
        if axis == 0 and getattr(plan, "nblockz", 0) > 1:
            # X sweep via the Z-blocked wavefront pipeline (the reference's
            # `blocking nBlockZ` mode, AdiSolver3D.cu:642-881): rows stay
            # X-sharded, carries flow device-to-device per z-block
            from ..parallel.pipeline import pipelined_tridiag_x_blocked
            from jax.sharding import NamedSharding, PartitionSpec as P
            m4 = [jnp.moveaxis(m, 1, 0) for m in (a, b, c, d)]
            m4 = [jax.lax.with_sharding_constraint(
                      m, NamedSharding(plan.mesh,
                                       P(plan.axis, None, None, None)))
                  for m in m4]
            x = pipelined_tridiag_x_blocked(*m4, plan=plan,
                                            nblockz=plan.nblockz, exact=exact)
            x = jnp.moveaxis(x, 0, 1)
            return jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(
                    plan.mesh,
                    jax.sharding.PartitionSpec(None, plan.axis, None, None)))
        # X sweep: reshard rows so lines are device-local (all_to_all over
        # ICI) — the TPU analogue of the reference's transpose option /
        # pipelined distributed Thomas (AdiSolver3D.cu:524-640).
        a, b, c, d = (plan.constrain_rows(m, axis) for m in (a, b, c, d))
        x = tridiag_solve(a, b, c, d, axis=axis + 1, exact=exact,
                          backend=backend)
        x = jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(
                plan.mesh,
                jax.sharding.PartitionSpec(None, plan.axis, None, None)))
        return x

    # the fused kernels keep whole lines VMEM-resident up to ~288 cells;
    # beyond that the chunked long-line kernel takes over — single-chip
    # and per shard under the shard_map wrapper alike
    n_sweep = rhs.u.shape[axis]
    wavefront_x = (axis == 0 and plan is not None
                   and getattr(plan, "nblockz", 0) > 1)
    solver = (solve_fused if (backend in ("fused", "fused_dma", "fused_full",
                                          "fused_bf16", "fused_nl",
                                          "fused_pcr", "fused_pcr_bf16")
                              and not wavefront_x)
              else solve_with_cls)
    x = solver(ga.cls_a[axis])
    if ga.cls_b[axis] is not None:
        x_b = solver(ga.cls_b[axis])
        x = jnp.where(ga.take_b[axis][None], x_b, x)
    return State3D(u=x[0], v=x[1], w=x[2], T=x[3])


def _solve_stream_fused(axis: int, rhs: State3D, temp: State3D, out: State3D,
                        ga: GridArrays3D, dt, pa: ParamsArgs3D, exact: bool,
                        bf16: bool = False, plan=None):
    """Streamed full-fusion path: in-kernel RHS build + solve + UpdateSegment
    + merge (ops/pallas_sweep_stream.py).  Same caller guarantees as
    _solve_merge_fused.  ``bf16``: rhs/out payloads stored bf16 in HBM
    (f32 compute; temp stays f32 so BC values remain exact).

    ``plan``: for the Y/Z directions the sharded grid-X axis is a pure
    batch dimension of the kernel AND of the in-kernel merge (NODE_IN is a
    local mask), so the whole fused direction-iteration runs per shard
    under shard_map with zero communication — the stencil forcing above it
    gets its halos from GSPMD.  The X direction must reshard (lines span
    shards) and is excluded by the caller."""
    from ..ops.pallas_sweep_stream import fused_sweep_stream
    h = (pa.dx, pa.dy, pa.dz)[axis]
    if axis == 0:
        diss = stencil.diss_x_3d(temp.u, temp.v, temp.w, pa.dx, pa.dy, pa.dz)
    elif axis == 1:
        diss = stencil.diss_y_3d(temp.u, temp.v, temp.w, pa.dx, pa.dy, pa.dz)
    else:
        diss = stencil.diss_z_3d(temp.u, temp.v, temp.w, pa.dx, pa.dy, pa.dz)
    forcing = pa.t_phi * diss
    scal = jnp.stack([pa.v_vis / (h * h), pa.t_vis / (h * h), 3.0 / dt,
                      1.0 / (2.0 * h), pa.v_T])
    temp4 = jnp.stack(tuple(temp))
    rhs4 = jnp.stack(tuple(rhs))
    op4 = jnp.stack(tuple(out))
    if bf16:
        # the casts fuse into the producing ops, so the payload only ever
        # hits HBM as bf16; outputs come back bf16 and upcast below
        rhs4 = rhs4.astype(jnp.bfloat16)
        op4 = op4.astype(jnp.bfloat16)
    cls = ga.cls_a[axis]

    def call_kernel(t4, c3, bv3, bt3, r4, o4_, f3, sweep_axis):
        kw = dict(sweep_axis=sweep_axis, axis_var=axis, exact=exact)
        if plan is None:
            return fused_sweep_stream(t4, c3, bv3, bt3, r4, o4_, f3, scal,
                                      **kw)
        from jax.sharding import PartitionSpec as P
        ax = plan.axis
        spec3 = P(ax, None, None)
        spec4 = P(None, ax, None, None)

        @functools.partial(jax.shard_map, mesh=plan.mesh,
                           in_specs=(spec4, spec3, spec3, spec3, spec4,
                                     spec4, spec3, P(None)),
                           out_specs=(spec4, spec4), check_vma=False)
        def run(t4_, c3_, bv3_, bt3_, r4_, o4__, f3_, scal_):
            return fused_sweep_stream(t4_, c3_, bv3_, bt3_, r4_, o4__, f3_,
                                      scal_, **kw)

        return run(t4, c3, bv3, bt3, r4, o4_, f3, scal)

    if axis == 2:
        sw = lambda t: jnp.swapaxes(t, 1, 2)
        sw4 = lambda t: jnp.swapaxes(t, 2, 3)
        o4, t4 = call_kernel(sw4(temp4), sw(cls), sw(ga.bc_vel),
                             sw(ga.bc_temp), sw4(rhs4), sw4(op4),
                             sw(forcing), sweep_axis=1)
        o4, t4 = sw4(o4), sw4(t4)
    else:
        o4, t4 = call_kernel(temp4, cls, ga.bc_vel, ga.bc_temp,
                             rhs4, op4, forcing, sweep_axis=axis)
    if bf16:
        o4 = o4.astype(jnp.float32)
        t4 = t4.astype(jnp.float32)
    return (State3D(t4[0], t4[1], t4[2], t4[3]),
            State3D(o4[0], o4[1], o4[2], o4[3]))


def _nl_pair_active(axis: int, n_sweep: int, backend: str, merge_ok_ax: bool,
                    dual_free: bool, num_local: int, plan) -> bool:
    """Static predicate: does this direction run the num_local-pair kernel
    (pallas_sweep_nl) for its local iterations?  Shared by the dispatch and
    by adi_timestep_3d's gmerge-fold decision so they can never diverge."""
    if (backend not in ("fused_nl", "fused_bf16", "fused_pcr",
                        "fused_pcr_bf16") or num_local < 2):
        return False
    if plan is not None and axis == 0 and num_local % 2 != 0:
        # a trailing odd local iteration would need the per-iteration
        # stream kernel, which cannot run on resharded X lines — fall back
        # to the fused_dma reshard path for the whole direction
        return False
    if not dual_free and num_local % 2 != 0:
        # dual-endpoint lines: the pair kernel stitches them in-kernel
        # (second elimination chain, pallas_sweep_nl cls_b/take_b) but the
        # stream kernel for the trailing odd iteration does not — fall
        # back for the whole direction on odd num_local
        return False
    from ..ops.pallas_sweep_nl import MAX_SWEEP
    return merge_ok_ax and n_sweep <= MAX_SWEEP


def _dir_path(axis: int, n_sweep: int, backend: str, merge_ok_ax: bool,
              dual_free: bool, num_local: int, plan) -> str:
    """Which implementation this direction's local iterations take:
      "pair"        — num_local-pair kernel only (even num_local),
      "pair+stream" — pair kernels + one trailing stream iteration,
      "stream"      — per-iteration streamed full-fusion kernel,
      "fallback"    — per-iteration XLA row build + fused/two-pass solve
                      (duals, long lines, non-fused backends, sharded X
                      without an even-num_local pair).
    The single source of truth for _solve_direction_3d's dispatch AND
    dispatch_report — they cannot diverge."""
    if backend not in ("fused_full", "fused_bf16", "fused_nl", "fused_pcr",
                       "fused_pcr_bf16"):
        return "fallback"
    from ..ops.pallas_sweep_stream import MAX_SWEEP as _SMAX
    if n_sweep > _SMAX:
        return "fallback"
    nl_here = _nl_pair_active(axis, n_sweep, backend, merge_ok_ax,
                              dual_free, num_local, plan)
    if nl_here:
        # the pair kernel handles dual-endpoint lines in-kernel; an odd
        # trailing stream iteration requires dual_free (enforced above)
        return "pair" if num_local % 2 == 0 else "pair+stream"
    if merge_ok_ax and dual_free and (plan is None or axis != 0):
        return "stream"
    return "fallback"


def _solve_nl_fused(axis: int, rhs: State3D, temp: State3D, out: State3D,
                    ga: GridArrays3D, dt, pa: ParamsArgs3D, exact: bool,
                    gmerge: bool = False, bf16: bool = False,
                    pcr: bool = False, plan=None):
    """num_local-PAIR fusion: TWO local iterations in one kernel invocation
    (ops/pallas_sweep_nl.py) — iteration 2's coefficients and dissipation
    forcing are rebuilt in-kernel from the VMEM-resident merged temp, so
    the grid is streamed once per pair instead of once per iteration (the
    structural ~2x HBM-traffic cut over the reference's per-iteration
    relaunch, AdiSolver3D.cpp:587-655).  BOTH iterations' t_phi*diss
    forcing is computed in-kernel (no XLA stencil pass at all).  Same
    caller guarantees as _solve_stream_fused.

    ``plan`` (Y/Z directions only): the in-kernel dissipation needs a
    +-1-plane halo across the sharded grid-X axis — for iteration 1 the
    neighbor's temp planes, for iteration 2 the neighbor's ITER-1 result,
    which no collective can deliver mid-kernel.  Instead each shard
    PRE-exchanges one boundary X-plane of every kernel input (ppermute
    over ICI; edge shards get zeros — physical border planes are never
    NODE_IN, so their diss values are masked), runs the pair kernel on
    the 1-plane-extended domain, and discards the halo planes of the
    outputs.  The halo plane's own sweep-direction line solve is thereby
    recomputed redundantly per shard — exactly the value iteration 2's
    cross-shard derivative needs, bitwise-identical to the owning shard's
    (same line, same inputs, same recurrence).  The reference's analog
    ships whole halo layers between GPUs per iteration
    (TimeLayer3D.h:158-335 syncHalos)."""
    from ..ops.pallas_sweep_nl import fused_sweep_nl
    # the (8,) scal vector incl. the cross-axis derivative scales in the
    # kernel's slab layout — shared with the stacked-carry step (_nl_scal)
    scal = _nl_scal(axis, pa, dt)
    temp4 = jnp.stack(tuple(temp))
    rhs4 = jnp.stack(tuple(rhs))
    op4 = jnp.stack(tuple(out))
    if bf16:
        # payload storage mode (casts fuse into the producers; compute,
        # temp/BC values and the in-kernel rings stay f32)
        rhs4 = rhs4.astype(jnp.bfloat16)
        op4 = op4.astype(jnp.bfloat16)
    cls = ga.cls_a[axis]
    clsb = ga.cls_b[axis]      # None on dual-free directions (common case)
    takeb = ga.take_b[axis]

    def call_kernel(t4, c3, bv3, bt3, r4, o4_, scal_, cb3=None, tb3=None):
        def mb(f):
            # apply a layout transform to the optional dual-mask arrays
            return (None if cb3 is None else f(cb3),
                    None if tb3 is None else f(tb3))

        if NL_XMODE and axis > 0:
            # route Y/Z through the sweep_axis=0 kernel layout: the sweep
            # dim becomes the slab's major dim, so the serial row loop
            # reads full (8,128) vreg tiles instead of gathering one
            # sublane from each of 8 tiles (the X direction's layout).
            perm3 = NL_PERM3[axis]
            inv3 = NL_INV3[axis]
            tr = lambda t: jnp.transpose(t, perm3)
            tr4 = lambda t: jnp.transpose(t, (0,) + tuple(d + 1
                                                          for d in perm3))
            itr4 = lambda t: jnp.transpose(t, (0,) + tuple(d + 1
                                                           for d in inv3))
            cbk, tbk = mb(tr)
            o4x, t4x = fused_sweep_nl(tr4(t4), tr(c3), tr(bv3), tr(bt3),
                                      tr4(r4), tr4(o4_), scal_,
                                      sweep_axis=0, axis_var=axis,
                                      exact=exact, gmerge=gmerge, pcr=pcr,
                                      cls_b=cbk, take_b=tbk)
            return itr4(o4x), itr4(t4x)
        if axis == 2:
            sw = lambda t: jnp.swapaxes(t, 1, 2)
            sw4 = lambda t: jnp.swapaxes(t, 2, 3)
            cbk, tbk = mb(sw)
            o4x, t4x = fused_sweep_nl(sw4(t4), sw(c3), sw(bv3), sw(bt3),
                                      sw4(r4), sw4(o4_), scal_,
                                      sweep_axis=1, axis_var=axis,
                                      exact=exact, gmerge=gmerge,
                                      cls_b=cbk, take_b=tbk)
            return sw4(o4x), sw4(t4x)
        # axis == 0 (sweep_axis=0) or the pre-xmode Y (sweep_axis=1);
        # PCR needs the xmode layout, so it rides only the former
        return fused_sweep_nl(t4, c3, bv3, bt3, r4, o4_, scal_,
                              sweep_axis=axis, axis_var=axis, exact=exact,
                              gmerge=gmerge, pcr=pcr and axis == 0,
                              cls_b=cb3, take_b=tb3)

    if plan is None:
        o4, t4 = call_kernel(temp4, cls, ga.bc_vel, ga.bc_temp,
                             rhs4, op4, scal, clsb, takeb)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = plan.axis
        nsh = plan.mesh.shape[ax]
        bcv, bct = ga.bc_vel, ga.bc_temp
        has_dual = clsb is not None
        padB = 0
        if axis == 0:
            # X lines span the shards: reshard so the Y batch dim splits
            # and the lines become device-local (the fused_dma path's
            # all_to_all transpose — but the pair kernel takes the raw
            # fields, not prebuilt rows, and runs BOTH local iterations
            # per reshard).  The sharded Y dim is the kernel's j-dim, so
            # the same 1-plane halo pre-exchange applies, along Y; padded
            # batch rows are identity rows (cls 0), cropped after.
            B = temp4.shape[2]
            padB = (-B) % nsh
            if padB:
                pY3 = ((0, 0), (0, padB), (0, 0))
                pY4 = ((0, 0),) + pY3
                temp4 = jnp.pad(temp4, pY4)
                rhs4 = jnp.pad(rhs4, pY4)
                op4 = jnp.pad(op4, pY4)
                cls = jnp.pad(cls, pY3)
                bcv = jnp.pad(bcv, pY3)
                bct = jnp.pad(bct, pY3)
                if has_dual:
                    clsb = jnp.pad(clsb, pY3)
                    takeb = jnp.pad(takeb, pY3)
            spec3 = P(None, ax, None)
            hdim3, hdim4 = 1, 2       # halo/shard dim: Y
        else:
            spec3 = P(ax, None, None)
            hdim3, hdim4 = 0, 1       # halo/shard dim: X
        spec4 = P(None, *spec3)
        fwd = [(i, i + 1) for i in range(nsh - 1)]   # i's last -> i+1's left
        bwd = [(i + 1, i) for i in range(nsh - 1)]   # i's first -> i-1's right
        db_specs = (spec3, spec3) if has_dual else ()

        @functools.partial(jax.shard_map, mesh=plan.mesh,
                           in_specs=(spec4, spec3, spec3, spec3, spec4,
                                     spec4, P(None)) + db_specs,
                           out_specs=(spec4, spec4), check_vma=False)
        def run(t4_, c3_, bv3_, bt3_, r4_, o4__, scal_, *db):
            def ext(arr, xdim):
                first = jax.lax.slice_in_dim(arr, 0, 1, axis=xdim)
                if nsh == 1:
                    z = jnp.zeros_like(first)
                    return jnp.concatenate([z, arr, z], axis=xdim)
                last = jax.lax.slice_in_dim(arr, arr.shape[xdim] - 1,
                                            arr.shape[xdim], axis=xdim)
                lh = jax.lax.ppermute(last, ax, fwd)
                rh = jax.lax.ppermute(first, ax, bwd)
                return jnp.concatenate([lh, arr, rh], axis=xdim)

            # dual masks halo-extend like cls: zero-filled edge planes
            # decode to identity rows with no dual/take flags
            dkw = {}
            if db:
                dkw = dict(cb3=ext(db[0], hdim3), tb3=ext(db[1], hdim3))
            o4x, t4x = call_kernel(ext(t4_, hdim4), ext(c3_, hdim3),
                                   ext(bv3_, hdim3), ext(bt3_, hdim3),
                                   ext(r4_, hdim4), ext(o4__, hdim4),
                                   scal_, **dkw)
            sl = [slice(None)] * 4
            sl[hdim4] = slice(1, -1)
            return o4x[tuple(sl)], t4x[tuple(sl)]

        db_args = (clsb, takeb) if has_dual else ()
        o4, t4 = run(temp4, cls, bcv, bct, rhs4, op4, scal, *db_args)
        if axis == 0:
            if padB:
                o4 = o4[:, :, :-padB]
                t4 = t4[:, :, :-padB]
            # back to the canonical X split for the XLA ops around us
            xsh = NamedSharding(plan.mesh, P(None, ax, None, None))
            o4 = jax.lax.with_sharding_constraint(o4, xsh)
            t4 = jax.lax.with_sharding_constraint(t4, xsh)
    if bf16:
        o4 = o4.astype(jnp.float32)
        t4 = t4.astype(jnp.float32)
    return (State3D(t4[0], t4[1], t4[2], t4[3]),
            State3D(o4[0], o4[1], o4[2], o4[3]))


def _nl_stacked_possible(shape3: tuple, dual_free3: tuple, backend: str,
                         num_local: int, merge_ok: tuple, plan) -> bool:
    """Static predicate for the stacked-carry step (NL_STACKED): every
    direction must run the num_local-pair kernel in xmode, with an even
    num_local so the global merge folds in-kernel.  Sharded runs
    additionally need a 1-D plan without the Z-blocked wavefront and a
    grid-X extent divisible by the shard count (every kernel layout puts
    grid X on the j-dim for Y/Z, so shard_map splits it exactly).

    ``shape3``: the (possibly step-padded) grid shape; ``dual_free3``:
    per-axis ``ga.cls_b[ax] is None``."""
    if (not NL_STACKED or not NL_XMODE
            or num_local < 2 or num_local % 2 != 0):
        return False
    if backend not in ("fused_nl", "fused_bf16", "fused_pcr",
                       "fused_pcr_bf16"):
        return False
    if plan is not None:
        if getattr(plan, "nblockz", 0) > 1:
            return False
        if shape3[0] % plan.mesh.shape[plan.axis] != 0:
            return False
    return all(_nl_pair_active(ax, shape3[ax], backend, merge_ok[ax],
                               dual_free3[ax], num_local, plan)
               for ax in range(3))


# step-level pad tile targets (sublanes, lanes, lanes) — module constants
# so tests can scale them down (128-lane tiles make any CPU-sized fixture
# trip the growth guard)
_STEP_TILES = (8, 128, 128)


def _step_pad(shape3: tuple, backend: str, plan):
    """adi_timestep_3d's step-level tile padding decision: the fused
    kernels need (x, y, z) padded to (8, 128, 128) multiples; padding once
    per step lets XLA drop every per-call pad/crop copy.  Returns the
    (px, py, pz) pad amounts or None.  Shared with dispatch_report.

    Under a 1-D plan (round 5) the pads additionally preserve shard
    divisibility — x stays evenly split (the set_plan invariant the
    stacked dispatch needs) and y splits for the targeted/stacked
    reshard — by padding those axes to lcm(tile, n_shards) multiples.
    The reference's analog is AlignBy32 + the ``align`` flag, kept
    precisely so multi-GPU slabs stay aligned (Geometry.h:564-568)."""
    if backend not in ("fused", "fused_dma",
                       "fused_full", "fused_bf16",
                       "fused_nl", "fused_pcr",
                       "fused_pcr_bf16"):
        return None
    nx, ny, nz = shape3
    tx, ty, tz = _STEP_TILES
    if plan is not None:
        import math
        nsh = plan.mesh.shape[plan.axis]
        tx = tx * nsh // math.gcd(tx, nsh)
        ty = ty * nsh // math.gcd(ty, nsh)
    tgt = (-nx % tx, -ny % ty, -nz % tz)
    grow = ((nx + tgt[0]) * (ny + tgt[1]) * (nz + tgt[2])) / max(
        nx * ny * nz, 1)
    return tgt if any(tgt) and grow <= 1.25 else None


def dispatch_report(shape3: tuple, ga: GridArrays3D, backend: str,
                    num_local: int, merge_ok: tuple = (False, False, False),
                    plan=None) -> dict:
    """Static dispatch visibility: exactly which execution paths
    adi_timestep_3d takes for these (static) arguments.

    The reference prints its per-direction segment decisions
    (OutputSegmentsInfo, AdiSolver3D.cpp:270-284); our dense dispatch was
    silent — and two round-3 silicon A/Bs measured fallback-vs-fallback
    without noticing.  Probes and the CLI print this; A/B harnesses assert
    the arm under test actually engaged (scripts/_nl_ab.py).

    Returns a dict:
      backend  — after alias/auto resolution (mirrors adi_timestep_3d),
      pad      — step-level tile padding applied, or None,
      stacked  — the whole-step stacked-carry fast path engages,
      targeted — the stacked step uses in-kernel layout-targeted writes,
      dirs     — {"X"|"Y"|"Z": "pair"|"pair+stream"|"stream"|"fallback"},
      xmode / pcr / bf16 — mode flags in effect.
    Computed with the SAME predicates the dispatch uses (_dir_path,
    _nl_stacked_possible, _nl_targeted_vmem_ok, _step_pad): report and
    dispatch cannot diverge."""
    if backend == "fused_merge":
        backend = "fused_full"
    if backend == "auto" and plan is not None:
        backend = ("fused_nl" if jax.default_backend() == "tpu"
                   else "fused")
    elif backend == "pallas" and plan is not None:
        backend = "scan"
    pad = _step_pad(tuple(shape3), backend, plan)
    pshape = (tuple(s + p for s, p in zip(shape3, pad)) if pad
              else tuple(shape3))
    dual_free = tuple(ga.cls_b[ax] is None for ax in range(3))
    pcr = backend in ("fused_pcr", "fused_pcr_bf16")
    bf16 = backend in ("fused_bf16", "fused_pcr_bf16")
    stacked = _nl_stacked_possible(pshape, dual_free, backend, num_local,
                                   merge_ok, plan)
    targeted = bool(stacked and NL_TARGETED
                    and _nl_targeted_shape_ok(pshape)
                    and _nl_targeted_vmem_ok(
                        pshape, pcr, bf16,
                        tuple(not d for d in dual_free), plan))
    dirs = {name: _dir_path(ax, pshape[ax], backend, merge_ok[ax],
                            dual_free[ax], num_local, plan)
            for ax, name in ((0, "X"), (1, "Y"), (2, "Z"))}
    return dict(backend=backend, pad=pad, stacked=stacked,
                targeted=targeted, xmode=NL_XMODE, pcr=pcr, bf16=bf16,
                dirs=dirs)


def _nl_targeted_shape_ok(shape3) -> bool:
    """Mosaic alignment gate for the targeted-layout writes: the
    lane-crossing staging stores slice the staging buffer per sublane
    row (pallas_sweep_nl.stage_store), and the slice's minormost extent
    is the kernel's sweep length n — Mosaic requires it 128-aligned
    ("Slice shape along dimension 3 must be aligned to tiling (128)").
    Z's and X's final kernels use lane-crossing perms (NL_TARGETED_CALLS),
    Y's are sublane-only, so the padded X and Z extents must be LANES
    multiples.  256^3 passes; 64^3-class grids degrade to the plain
    stacked step.  Mosaic-only: the Pallas interpreter (CPU tests) has no
    tiling constraint, so small-grid CPU tests keep exercising the
    targeted staging logic."""
    if jax.default_backend() != "tpu":
        return True
    from ..ops.sweep_common import LANES, S_TILE, ceil_to

    def lane_crossing_ok(ax):
        perm, op, tp = NL_TARGETED_CALLS[ax]
        crossing = any(p in ((1, 2, 0), (2, 1, 0)) for p in op)
        crossing = crossing or tp in ((1, 2, 0), (2, 1, 0))
        if not crossing:
            return True
        n = ceil_to(shape3[ax], S_TILE)     # the direction's sweep length
        return n % LANES == 0

    return all(lane_crossing_ok(ax) for ax in range(3))


def _nl_targeted_vmem_ok(shape3, pcr: bool, bf16: bool,
                         dual3=(False, False, False), plan=None) -> bool:
    """True when every targeted-layout final-pair kernel of the stacked
    step fits the Mosaic VMEM grant cap.  The pcr x targeted combination
    exceeds it at 256^3 (~144 MB request vs the 110 MB cap; 127 MB bf16)
    — degrading to the plain stacked step trades the saved relayouts for
    a run that compiles (NOTES_NEXT 0b).  The call table is
    NL_TARGETED_CALLS — the same constant _nl_stacked_step_targeted
    drives its kernels with.  ``dual3``: per-axis dual-endpoint presence
    (adds the pass-B chain scratch to the estimate).  ``plan`` is
    accepted for call-site symmetry but does NOT relax the gate: the
    kernel blocks over its j-dim, so the per-block VMEM request is
    j-extent-independent and splitting j across shards changes nothing
    (verified against nl_vmem_request at 256^3 pcr: 144 MB at full AND
    at split-j local shapes)."""
    from ..ops.pallas_sweep_nl import nl_vmem_request
    del plan
    for ax in (2, 1, 0):
        perm, op, tp = NL_TARGETED_CALLS[ax]
        s = tuple(shape3[k] for k in perm)
        req, cap = nl_vmem_request(s, 0, pcr=pcr, bf16=bf16,
                                   out_perms=op, tn_perm=tp,
                                   has_dual=dual3[ax])
        if req > cap:
            return False
    return True


def _nl_targeted_masks(ga: GridArrays3D) -> dict:
    """Per-direction static mask bundles in the TARGETED kernel layouts
    (L_X=(x,y,z), L_Y=(y,x,z), L_Z=(z,y,x)): (cls, bc_vel, bc_temp,
    cls_b, take_b), each transposed from canonical.  Shared by the
    in-step targeted path (transposed inside every traced step) and the
    carried-state API (transposed ONCE at setup, nl_carried_pre)."""
    PZ = (2, 1, 0)     # L_X <-> L_Z (self-inverse)
    PY = (1, 0, 2)     # L_X <-> L_Y (self-inverse)
    masks = {}
    for axis, p in ((0, None), (1, PY), (2, PZ)):
        c, bv, bt = ga.cls_a[axis], ga.bc_vel, ga.bc_temp
        cb, tb = ga.cls_b[axis], ga.take_b[axis]
        if p is not None:
            c, bv, bt = (jnp.transpose(a, p) for a in (c, bv, bt))
            cb = None if cb is None else jnp.transpose(cb, p)
            tb = None if tb is None else jnp.transpose(tb, p)
        masks[axis] = (c, bv, bt, cb, tb)
    return masks


def _nl_targeted_sharded_call(axis, masks5, scal, exact, pcr, plan):
    """shard_map wrapper for one targeted-stacked direction under a 1-D
    plan — the round-5 closure of "the multi-chip path must run the same
    fast program" (the reference's multi-GPU path runs the identical hot
    kernels, AdiSolver3D.cu:376-404).  Every targeted kernel layout
    (L_X=(x,y,z), L_Y=(y,x,z), L_Z=(z,y,x)) puts a sharded grid axis on
    the kernel j-dim — grid X for the Y direction, grid Y for Z and X —
    so the SAME 1-plane j-halo ppermute pre-exchange as the plain stacked
    path serves all three directions, and each targeted output emerges
    sharded on whichever dim the kernel j lands at (perm.index(1)):
    X's L_Z writes land exactly where the next Z call wants them
    (collective-free), Z's L_Y / Y's L_X writes sit one all_to_all from
    their consumer — the constraint below lets GSPMD insert exactly
    those reshards (4 per global iteration at the HLO level, vs the
    plain stacked path's 2 reshard points of <=5 operands — same
    collective class, zero XLA relayouts)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..ops.pallas_sweep_nl import fused_sweep_nl
    cls, bv, bt, cb, tb = masks5
    ax = plan.axis
    nsh = plan.mesh.shape[ax]
    spec3 = P(None, ax, None)
    spec4 = P(None, None, ax, None)
    sh4 = NamedSharding(plan.mesh, spec4)
    fwd = [(i, i + 1) for i in range(nsh - 1)]
    bwd = [(i + 1, i) for i in range(nsh - 1)]
    has_dual = cb is not None

    def ext(arr, dim):
        # 1-plane j-halo pre-exchange (identical machinery to the plain
        # stacked path): edge shards get zero planes, which decode to
        # identity rows / masked-out dissipation neighbors
        first = jax.lax.slice_in_dim(arr, 0, 1, axis=dim)
        if nsh == 1:
            z = jnp.zeros_like(first)
            return jnp.concatenate([z, arr, z], axis=dim)
        last = jax.lax.slice_in_dim(arr, arr.shape[dim] - 1,
                                    arr.shape[dim], axis=dim)
        lh = jax.lax.ppermute(last, ax, fwd)
        rh = jax.lax.ppermute(first, ax, bwd)
        return jnp.concatenate([lh, arr, rh], axis=dim)

    def ospec(p):
        # the kernel j-dim (dim 1 of the kernel layout) lands at output
        # dim p.index(1); that is where the shard lives
        return P(None, *[ax if i == p.index(1) else None for i in range(3)])

    def kcall(t4_, r4_, o4_, ops_, tnp_, gm):
        db_specs = (spec3, spec3) if has_dual else ()

        @functools.partial(jax.shard_map, mesh=plan.mesh,
                           in_specs=(spec4, spec3, spec3, spec3, spec4,
                                     spec4, P(None)) + db_specs,
                           out_specs=(tuple(ospec(p) for p in ops_),
                                      ospec(tnp_)),
                           check_vma=False)
        def krun(t4s, c3s, bvs, bts, r4s, o4s, scal_, *db):
            dkw = {}
            if db:
                dkw = dict(cls_b=ext(db[0], 1), take_b=ext(db[1], 1))
            res, t4x = fused_sweep_nl(
                ext(t4s, 2), ext(c3s, 1), ext(bvs, 1), ext(bts, 1),
                ext(r4s, 2), ext(o4s, 2), scal_, sweep_axis=0,
                axis_var=axis, exact=exact, gmerge=gm, pcr=pcr,
                out_perms=ops_, tn_perm=tnp_, swap_cross=(axis == 2),
                **dkw)

            def crop(a, p):
                sl = [slice(None)] * 4
                sl[1 + p.index(1)] = slice(1, -1)
                return a[tuple(sl)]

            return (tuple(crop(a, p) for a, p in zip(res, ops_)),
                    crop(t4x, tnp_))

        # operands arrive either already j-sharded (the collective-free
        # X->Z handoff) or sharded on the producer's landing dim; the
        # constraint makes GSPMD insert exactly the needed all_to_all
        t4c = jax.lax.with_sharding_constraint(t4_, sh4)
        r4c = jax.lax.with_sharding_constraint(r4_, sh4)
        o4c = jax.lax.with_sharding_constraint(o4_, sh4)
        db_args = (cb, tb) if has_dual else ()
        return krun(t4c, cls, bv, bt, r4c, o4c, scal, *db_args)

    return kcall


def _nl_targeted_run_dir(axis, temp4, rhs4, op4, masks, scals,
                         num_local: int, exact: bool, bf16: bool, pcr: bool,
                         out_perms, tn_perm, gmerge_last: bool, plan=None):
    """One direction of the targeted stacked step: num_local//2 pair-kernel
    invocations chained through VMEM-layout identity writes; only the
    FINAL pair writes the targeted (consumer-layout) outputs.  Under a
    plan the kernel runs per shard via _nl_targeted_sharded_call."""
    from ..ops.pallas_sweep_nl import fused_sweep_nl, IDP
    f32 = jnp.float32
    cls, bv, bt, cb, tb = masks[axis]

    if plan is None:
        def kcall(t4_, r4_, o4_, ops_, tnp_, gm):
            return fused_sweep_nl(
                t4_, cls, bv, bt, r4_, o4_, scals[axis], sweep_axis=0,
                axis_var=axis, exact=exact, gmerge=gm, pcr=pcr,
                out_perms=ops_, tn_perm=tnp_, swap_cross=(axis == 2),
                cls_b=cb, take_b=tb)
    else:
        kcall = _nl_targeted_sharded_call(axis, masks[axis], scals[axis],
                                          exact, pcr, plan)
    r4 = rhs4.astype(jnp.bfloat16) if bf16 else rhs4
    pairs = num_local // 2
    out4 = op4
    for k in range(pairs):
        last = k == pairs - 1
        o_in = out4.astype(jnp.bfloat16) if bf16 else out4
        res, tn4 = kcall(temp4, r4, o_in,
                         out_perms if last else (IDP,),
                         tn_perm if last else IDP,
                         gmerge_last and last)
        if bf16:
            res = tuple(o.astype(f32) for o in res)
            tn4 = tn4.astype(f32)
        if not last:
            temp4, out4 = tn4, res[0]
    return res, tn4


def _nl_targeted_loop(tempZ, curZ, opZ, half4, masks, scals,
                      num_global: int, num_local: int, exact: bool,
                      bf16: bool, pcr: bool, final_out_perms,
                      final_tn_perm, plan=None):
    """The targeted stacked global loop (data flow per global iteration,
    TimeStep AdiSolver3D.cpp:335-358):
      Z: temp/rhs/op @ L_Z -> tn @ L_Y (Y temp), out @ L_Y (Y rhs)
                                                 + L_X (X op)
      Y: temp/rhs @ L_Y, op = half4 @ L_Y -> tn @ L_X (X temp),
         out @ L_Y (next-Y op, aliased) + L_X (X rhs)
      X: temp/rhs/op @ L_X, gmerge folded -> tn @ L_Z (next Z temp),
         out @ L_Z (next Z op); final iteration: out @ ``final_out_perms``.

    ``final_out_perms``/``final_tn_perm`` pick the LAST global
    iteration's X output layout: identity for the in-step path (the
    canonical L_X result stack), (2,1,0) for the carried-state API
    (the NEXT step's L_Z operand, written in-kernel — no XLA transpose).
    out_perms/tn_perm of the other calls come from the shared
    NL_TARGETED_CALLS table (also the VMEM checker's source of truth)."""
    def rd(axis, t4_, r4_, o4_, out_perms, tn_perm, gmerge_last):
        return _nl_targeted_run_dir(axis, t4_, r4_, o4_, masks, scals,
                                    num_local, exact, bf16, pcr,
                                    out_perms, tn_perm, gmerge_last,
                                    plan=plan)

    nxt_out = None
    for g in range(num_global):
        last_g = g == num_global - 1
        (rhsY, opX), tY = rd(2, tempZ, curZ, opZ,
                             out_perms=NL_TARGETED_CALLS[2][1],
                             tn_perm=NL_TARGETED_CALLS[2][2],
                             gmerge_last=False)
        (half4, rhsX), tX = rd(1, tY, rhsY, half4,
                               out_perms=NL_TARGETED_CALLS[1][1],
                               tn_perm=NL_TARGETED_CALLS[1][2],
                               gmerge_last=False)
        if last_g:
            (nxt_out,), _ = rd(0, tX, rhsX, opX, out_perms=final_out_perms,
                               tn_perm=final_tn_perm, gmerge_last=True)
        else:
            (opZ,), tempZ = rd(0, tX, rhsX, opX,
                               out_perms=NL_TARGETED_CALLS[0][1],
                               tn_perm=NL_TARGETED_CALLS[0][2],
                               gmerge_last=True)
    return nxt_out


def _nl_stacked_step_targeted(cur: State3D, nxt: State3D, ga: GridArrays3D,
                              dt, num_global: int, num_local: int,
                              pa: ParamsArgs3D, exact: bool, bf16: bool,
                              pcr: bool = False, plan=None):
    """Stacked-carry step with in-kernel layout-targeted output writes:
    each direction's final pair kernel writes out/tn DIRECTLY in the
    consuming direction's kernel layout (fused_sweep_nl out_perms/tn_perm;
    dual-consumer outputs are written once per consumer), so the XLA
    relayouts between directions vanish — only the once-per-step seeding
    transposes remain (the carried-state API below removes those too).

    Layouts: L_X=(x,y,z), L_Y=(y,x,z), L_Z=(z,y,x).  NB: Z differs from
    the non-targeted stacked step's (z,x,y): with (z,y,x) EVERY targeted
    write's innermost destination run is long (the sweep dim n, or a full
    LANES row), so the permuted-slice DMAs stay bandwidth-efficient.  The
    flip puts o2's coordinate (y) on Z's j-dim — the kernel runs
    swap_cross=True with an hj/hl-swapped scal; per-cell math is
    unchanged, so the whole step stays bitwise equal to the plain stacked
    path (test_backends3d).

    ``plan``: each direction runs per shard via _nl_targeted_sharded_call
    (grid Y padded ONCE per step for the Z/X shard divisibility — padded
    rows are identity rows, cropped at exit; grid X divisibility is a
    _nl_stacked_possible precondition).  Bitwise vs the plain sharded
    stacked step (test_parallel)."""
    PZ = (2, 1, 0)

    def t4(a, p):
        return jnp.transpose(a, (0,) + tuple(d + 1 for d in p))

    scals = {0: _nl_scal(0, pa, dt), 1: _nl_scal(1, pa, dt),
             2: _nl_scal(2, pa, dt, swap_jl=True)}
    cur4 = jnp.stack(tuple(cur))                      # L_X
    nxt4 = jnp.stack(tuple(nxt))                      # L_X
    ny0 = cur4.shape[2]
    ga_k = ga
    if plan is not None:
        nsh = plan.mesh.shape[plan.axis]
        pad_y = (-ny0) % nsh
        if pad_y:
            p3 = ((0, 0), (0, pad_y), (0, 0))
            ga_k = ga._replace(
                cls_a=tuple(jnp.pad(c, p3) for c in ga.cls_a),
                cls_b=tuple(None if c is None else jnp.pad(c, p3)
                            for c in ga.cls_b),
                take_b=tuple(None if c is None else jnp.pad(c, p3)
                             for c in ga.take_b),
                bc_vel=jnp.pad(ga.bc_vel, p3),
                bc_temp=jnp.pad(ga.bc_temp, p3))
            cur4 = jnp.pad(cur4, ((0, 0),) + p3)
            nxt4 = jnp.pad(nxt4, ((0, 0),) + p3)
    masks = _nl_targeted_masks(ga_k)
    n4, nx, ny, nz = cur4.shape
    curZ = t4(cur4, PZ)                               # Z's rhs, constant
    tempZ = curZ                                      # temp == cur, @ L_Z
    opZ = t4(nxt4, PZ)                                # Z's out_prev @ L_Z
    half4 = jnp.zeros((n4, ny, nx, nz), cur4.dtype)   # L_Y
    out = _nl_targeted_loop(tempZ, curZ, opZ, half4, masks, scals,
                            num_global, num_local, exact, bf16, pcr,
                            final_out_perms=(IDP3,), final_tn_perm=IDP3,
                            plan=plan)
    if plan is not None:
        if ny0 != out.shape[2]:
            out = out[:, :, :ny0]
        from jax.sharding import NamedSharding, PartitionSpec as P
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(plan.mesh, P(None, plan.axis, None, None)))
    return out


# ---------------------------------------------------------------------------
# Carried-state API: the whole SIMULATION (not just one step) runs on
# stacked 4-var arrays kept in the Z kernel layout L_Z=(z,y,x) between
# steps.  adi_timestep_3d re-stacks State3D, transposes into L_Z, and
# unstacks back every step (~8 ms/step of the 56 ms bench step at 256^3 —
# probe_glue's residual); a caller that owns the step loop (bench.py,
# cli3d steady runs) can instead carry (curZ, prevZ) across steps and
# pay the transposes once.  The per-step work then starts at the
# boundary re-seed (TimeStep's next-layer seeding, done elementwise in
# L_Z — bitwise equal to seeding in canonical layout) and ends with the
# X direction's final pair kernel writing the new layer DIRECTLY @ L_Z
# via a targeted (2,1,0) write — zero XLA transposes per step.
# Bitwise: nl_carried_end(step^n(begin(s))) == adi_timestep_3d^n(s)
# (tests/test_carried.py).  The reference analog is keeping cur/next
# resident on the GPU between TimeStep calls (FluidSolver3D.cpp run loop)
# — we additionally keep them in the hot kernel's memory LAYOUT.
# Divergence error is not computed per step (bench runs
# compute_error=False); use nl_carried_end + stencil.div_error_3d when
# needed.
# ---------------------------------------------------------------------------

def nl_carried_pre(ga: GridArrays3D, backend: str, num_local: int,
                   merge_ok: tuple, dtype=jnp.float32, plan=None):
    """Static setup for the carried-state loop, or None when it cannot
    engage (it requires exactly the targeted stacked dispatch, with no
    step padding).  Returns a dict holding the pre-permuted mask bundles
    (_nl_targeted_masks, built ONCE), the L_Z-layout BOUND|VALVE re-seed
    mask, and the static mode flags.

    ``plan`` (round 5): the carried loop runs SHARDED — each direction's
    kernels run per shard via _nl_targeted_sharded_call, the carried
    (curZ, prevZ) arrays live sharded on grid Y (the Z/X kernels' j-dim)
    across steps, and the X direction's final L_Z write lands exactly on
    that sharding (collective-free across steps) — the reference keeps
    state device-resident across TimeSteps in its multi-GPU path likewise
    (FluidSolver3D.cpp:226-262).  Grid Y must split evenly: a per-step
    y-pad cannot be carried across steps, so non-divisible grids degrade
    to the per-step loop (callers warn — solver3d.carried_runner)."""
    shape3 = tuple(ga.types.shape)
    rep = dispatch_report(shape3, ga, backend, num_local, merge_ok, plan)
    if not rep["targeted"] or rep["pad"] is not None:
        return None
    if plan is not None and shape3[1] % plan.mesh.shape[plan.axis]:
        return None
    is_bv = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    # seed elision (NL_CARRIED_NOSEED above), PER VARIABLE: a channel's
    # re-seed is droppable exactly when its bc array has no FREE cell on
    # the bv set — FREE rows are the only mechanism that rewrites a
    # boundary cell with a solved (mirror) value each step.  u/v/w ride
    # bc_vel, T rides bc_temp (the bench box case: bc_vel all-NoSlip,
    # bc_temp FREE on the walls -> seed_vars == (3,), only T re-seeds).
    tn = np.asarray(ga.types)
    bvn = (tn == NodeType.BOUND) | (tn == NodeType.VALVE)
    free_vel = bool((np.asarray(ga.bc_vel)[bvn] == BCtype.FREE).any())
    free_tmp = bool((np.asarray(ga.bc_temp)[bvn] == BCtype.FREE).any())
    seed_vars = (((0, 1, 2) if free_vel else ())
                 + ((3,) if free_tmp else ()))
    if not NL_CARRIED_NOSEED:
        seed_vars = (0, 1, 2, 3)
    PZ4 = (0, 3, 2, 1)
    val4Z = jnp.transpose(jnp.stack((ga.val_u, ga.val_v, ga.val_w,
                                     ga.val_T)), PZ4)
    return dict(masks=_nl_targeted_masks(ga),
                is_bvZ=jnp.transpose(is_bv, (2, 1, 0)), val4Z=val4Z,
                bf16=rep["bf16"], pcr=rep["pcr"], backend=rep["backend"],
                seed_vars=seed_vars,
                seed_elidable=seed_vars == (), plan=plan)


def _carried_sharding(plan):
    """The carried 4-array (n4, z, y, x) lives sharded on grid Y (dim 2):
    the Z and X kernels' j-dim sharding in the L_Z layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(plan.mesh, P(None, None, plan.axis, None))


@functools.partial(jax.jit, static_argnames=("plan",))
def nl_carried_begin(cur: State3D, nxt_prev: State3D, plan=None):
    """Enter the carried representation: (curZ, prevZ) stacked @ L_Z
    (sharded on grid Y under a plan)."""
    PZ4 = (0, 3, 2, 1)
    cz = jnp.transpose(jnp.stack(tuple(cur)), PZ4)
    pz = jnp.transpose(jnp.stack(tuple(nxt_prev)), PZ4)
    if plan is not None:
        sh = _carried_sharding(plan)
        cz = jax.lax.with_sharding_constraint(cz, sh)
        pz = jax.lax.with_sharding_constraint(pz, sh)
    return cz, pz


@functools.partial(jax.jit, static_argnames=("plan",))
def nl_carried_end(stateZ, plan=None) -> State3D:
    """Leave the carried representation: canonical-layout State3D (grid-X
    sharded under a plan — the solver's state sharding).
    A separate jit from any consumer reduction so e.g. a checksum
    reduces over the SAME canonical layout as the step-API path
    (bitwise-comparable sums)."""
    s4 = jnp.transpose(stateZ, (0, 3, 2, 1))
    if plan is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        s4 = jax.lax.with_sharding_constraint(
            s4, NamedSharding(plan.mesh, P(None, plan.axis, None, None)))
    return State3D(s4[0], s4[1], s4[2], s4[3])


def _nl_carried_step_impl(curZ, prevZ, masks, is_bvZ, val4Z,
                          dt, pa: ParamsArgs3D,
                          num_global: int, num_local: int, exact: bool,
                          bf16: bool, pcr: bool, reseed_bv: bool,
                          seed_vars: tuple = (0, 1, 2, 3), plan=None):
    """``seed_vars``: the variable channels whose per-step re-seed is
    still REQUIRED — a channel is dropped (NL_CARRIED_NOSEED) only when
    its bc array has no FREE cell on the bv set AND the caller
    guaranteed seeded initial layers, making its where() a bitwise no-op
    (bv values are step-invariant: Dirichlet rows write exactly d=val).
    On TPU ``prevZ`` is DONATED (the jit wrapper below): every caller
    follows the reference's pointer swap (curZ, prevZ = result, curZ),
    so the partial re-seed updates the dead buffer's channels in place
    instead of copying the grid.  The CPU/interpreter wrapper skips the
    donation: it buys nothing without the TPU memory planner and the
    aliased-parameter program tickled a flaky XLA:CPU compiler segfault
    in the full-suite process (2026-08-21)."""
    n4, nz, ny, nx = curZ.shape
    if len(seed_vars) == 0:
        opZ = prevZ
    elif len(seed_vars) < n4:
        # partial elision (e.g. the bench case: bc_vel all-NoSlip but
        # bc_temp FREE on the walls -> only T re-seeds): in-place
        # channel updates on the donated prevZ buffer
        src = val4Z if reseed_bv else curZ
        opZ = prevZ
        for v in seed_vars:
            opZ = opZ.at[v].set(jnp.where(is_bvZ, src[v], prevZ[v]))
        if reseed_bv:
            for v in seed_vars:
                curZ = curZ.at[v].set(jnp.where(is_bvZ, val4Z[v],
                                                curZ[v]))
    elif reseed_bv:
        # the cli3d loop's per-step UpdateBoundaries (grid values imposed
        # on BOUND/VALVE cells of BOTH layers, AdiSolver3D.cpp:286-304),
        # done elementwise in L_Z — needed because FREE-BC rows overwrite
        # boundary cells with solved (mirror) values each step
        curZ = jnp.where(is_bvZ[None], val4Z, curZ)
        opZ = jnp.where(is_bvZ[None], val4Z, prevZ)
    else:
        # bench loop semantics (no per-step UpdateBoundaries): next-layer
        # seeding (adi_timestep_3d's where(is_bv, cur, nxt_prev)),
        # elementwise in L_Z — bitwise equal to seeding canonically
        opZ = jnp.where(is_bvZ[None], curZ, prevZ)
    half4 = jnp.zeros((n4, ny, nx, nz), curZ.dtype)   # L_Y
    scals = {0: _nl_scal(0, pa, dt), 1: _nl_scal(1, pa, dt),
             2: _nl_scal(2, pa, dt, swap_jl=True)}
    return _nl_targeted_loop(curZ, curZ, opZ, half4, masks, scals,
                             num_global, num_local, exact, bf16, pcr,
                             final_out_perms=((2, 1, 0),),
                             final_tn_perm=IDP3, plan=plan)


_CARRIED_STATICS = ("num_global", "num_local", "exact", "bf16", "pcr",
                    "reseed_bv", "seed_vars", "plan")
_nl_carried_step_donate = functools.partial(
    jax.jit, static_argnames=_CARRIED_STATICS,
    donate_argnames=("prevZ",))(_nl_carried_step_impl)
_nl_carried_step_nodonate = functools.partial(
    jax.jit, static_argnames=_CARRIED_STATICS)(_nl_carried_step_impl)


def _nl_carried_step_jit(*args, **kw):
    if jax.default_backend() == "tpu":
        return _nl_carried_step_donate(*args, **kw)
    return _nl_carried_step_nodonate(*args, **kw)


def nl_carried_step(curZ, prevZ, pre: dict, dt, pa: ParamsArgs3D,
                    num_global: int, num_local: int, exact: bool = True,
                    reseed_bv: bool = False, assume_seeded: bool = False):
    """One reference TimeStep (AdiSolver3D.cpp:306-391) on carried L_Z
    state.  Returns the new layer @ L_Z; the caller swaps
    ``curZ, prevZ = result, curZ`` (the reference's cur/next pointer
    swap, FluidSolver3D.cpp run loop).  ``reseed_bv``: also re-impose the
    grid's BOUND/VALVE values on both layers first — the cli3d loop's
    per-step UpdateBoundaries (bench keeps False: its step-API arm has
    no per-step UpdateBoundaries either).  ``assume_seeded``: the caller
    guarantees BOTH initial layers entered nl_carried_begin with
    update_boundaries applied (bench/cli do) — combined with the
    per-variable grid predicate pre["seed_vars"] (channels whose bc has
    a FREE cell on the bv set) this elides the no-op channels of the
    per-step re-seed and updates the rest in place on the donated prevZ
    buffer (NL_CARRIED_NOSEED; multi-step bitwise equality pinned in
    tests/test_carried)."""
    return _nl_carried_step_jit(curZ, prevZ, pre["masks"], pre["is_bvZ"],
                                pre["val4Z"], dt, pa, num_global=num_global,
                                num_local=num_local, exact=exact,
                                bf16=pre["bf16"], pcr=pre["pcr"],
                                reseed_bv=reseed_bv,
                                seed_vars=(pre.get("seed_vars",
                                                   (0, 1, 2, 3))
                                           if assume_seeded
                                           else (0, 1, 2, 3)),
                                plan=pre.get("plan"))


def _nl_stacked_step(cur: State3D, nxt: State3D, ga: GridArrays3D, dt,
                     num_global: int, num_local: int, pa: ParamsArgs3D,
                     exact: bool, bf16: bool, pcr: bool = False,
                     plan=None):
    """The whole TimeStep on stacked 4-var field arrays carried in each
    direction's kernel layout (see NL_STACKED above).

    Layouts (all directions use the sweep_axis=0 kernel):
      L_X = (x, y, z)   L_Y = (y, x, z)   L_Z = (z, x, y)
    Data flow per global iteration (TimeStep, AdiSolver3D.cpp:335-358):
      Z: rhs=cur@L_Z (transposed ONCE per step), temp@L_Z, out=nxt@L_Z
      Y: rhs=nxt@L_Z->L_Y, temp@L_Z->L_Y, out=half@L_Y (persistent in L_Y:
         its producer and consumer-as-out are both the Y direction)
      X: rhs=half@L_Y->L_X, temp@L_Y->L_X, out=nxt@L_Z->L_X, global merge
         folded in-kernel (gmerge) on the final pair.
    Returns the new next layer as a stacked (4, nx, ny, nz) array.

    ``plan`` (sharded runs): EVERY kernel layout places the sharded grid-X
    axis on the kernel's j-dim for Y/Z — and the X direction reshards so
    grid Y (again the j-dim) splits — so ONE uniform shard_map wrapper
    with the 1-plane j-halo pre-exchange of _solve_nl_fused serves all
    three directions.  Z->Y transposes keep grid X on dim 1 (collective-
    free, GSPMD-local); only entering and leaving L_X reshards — two
    reshard points per global iteration (measured in compiled HLO at
    ng=2: 9 vs the per-direction path's 27 all-to-alls, same halo
    collective-permutes, zero all-gathers —
    test_sharded_nl_stacked_collective_budget pins this).  Per-cell
    kernel operands are bit-identical to the per-direction sharded
    path, so results stay bitwise equal (test_parallel)."""
    if NL_TARGETED:
        dual3 = tuple(ga.cls_b[ax] is not None for ax in range(3))
        if (_nl_targeted_shape_ok(cur.u.shape)
                and _nl_targeted_vmem_ok(cur.u.shape, pcr, bf16, dual3,
                                         plan)):
            return _nl_stacked_step_targeted(cur, nxt, ga, dt, num_global,
                                             num_local, pa, exact, bf16, pcr,
                                             plan=plan)
        if _nl_targeted_shape_ok(cur.u.shape):
            # only warn for the VMEM case: shape-misaligned grids are the
            # expected small-grid regime, not a configuration surprise
            import warnings
            warnings.warn(
                "NL_TARGETED degraded to the plain stacked step: the "
                "targeted kernels' VMEM request exceeds the grant cap at "
                f"this grid ({cur.u.shape}, pcr={pcr}, bf16={bf16}, "
                f"sharded={plan is not None}) — see "
                "pallas_sweep_nl.nl_vmem_request", stacklevel=2)
    from ..ops.pallas_sweep_nl import fused_sweep_nl
    f32 = jnp.float32

    def compose(p, q):
        # transpose(transpose(x, p), q) == transpose(x, compose(p, q))
        return tuple(p[k] for k in q)

    # direction-transition perms, derived from the shared layout tables so
    # the stacked path can never diverge from _solve_nl_fused's xmode
    PX2Z = NL_PERM3[2]             # (x,y,z) -> (z,x,y)
    PX2Y = NL_PERM3[1]             # (x,y,z) -> (y,x,z) (static masks only)
    PZ2X = NL_INV3[2]              # (z,x,y) -> (x,y,z)
    PY2X = NL_INV3[1]              # (y,x,z) -> (x,y,z)
    PZ2Y = compose(PZ2X, PX2Y)     # (z,x,y) -> (y,x,z)

    def t3(a, p):
        return jnp.transpose(a, p)

    def t4(a, p):
        return jnp.transpose(a, (0,) + tuple(d + 1 for d in p))

    scals = {ax: _nl_scal(ax, pa, dt) for ax in range(3)}

    cur4 = jnp.stack(tuple(cur))                      # L_X
    nxt4 = jnp.stack(tuple(nxt))                      # L_X
    ny0 = cur4.shape[2]
    ga_k = ga
    if plan is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = plan.axis
        nsh = plan.mesh.shape[ax]
        # grid Y is the X direction's shard (j-)dim: pad it ONCE for the
        # whole step to shard divisibility — padded rows are identity rows
        # (cls 0), inert in Y's sweep dim and Z's lane dim alike, cropped
        # at the end (the per-direction path pads per X call instead)
        pad_y = (-ny0) % nsh
        if pad_y:
            p3 = ((0, 0), (0, pad_y), (0, 0))
            ga_k = ga._replace(
                cls_a=tuple(jnp.pad(c, p3) for c in ga.cls_a),
                cls_b=tuple(None if c is None else jnp.pad(c, p3)
                            for c in ga.cls_b),
                take_b=tuple(None if c is None else jnp.pad(c, p3)
                             for c in ga.take_b),
                bc_vel=jnp.pad(ga.bc_vel, p3),
                bc_temp=jnp.pad(ga.bc_temp, p3))
            cur4 = jnp.pad(cur4, ((0, 0),) + p3)
            nxt4 = jnp.pad(nxt4, ((0, 0),) + p3)

    # static masks per direction, in kernel layout (traced once; XLA CSEs
    # the transposed copies across global iterations); dual-endpoint
    # directions carry their pass-B class + stitch masks alongside
    masks = {}
    for axis, p in ((0, None), (1, PX2Y), (2, PX2Z)):
        c, bv, bt = ga_k.cls_a[axis], ga_k.bc_vel, ga_k.bc_temp
        cb, tb = ga_k.cls_b[axis], ga_k.take_b[axis]
        if p is not None:
            c, bv, bt = t3(c, p), t3(bv, p), t3(bt, p)
            cb = None if cb is None else t3(cb, p)
            tb = None if tb is None else t3(tb, p)
        masks[axis] = (c, bv, bt, cb, tb)

    if plan is None:
        def call(axis, t4_, r4_, o4_, gmerge):
            cls, bv, bt, cb, tb = masks[axis]
            return fused_sweep_nl(t4_, cls, bv, bt, r4_, o4_, scals[axis],
                                  sweep_axis=0, axis_var=axis, exact=exact,
                                  gmerge=gmerge, pcr=pcr,
                                  cls_b=cb, take_b=tb)
    else:
        # every direction's kernel layout has the sharded dim on the
        # kernel's j-dim (grid X for Y/Z, grid Y for the resharded X), so
        # one wrapper serves all three: 1-plane j-halo pre-exchange over
        # ICI, kernel per shard, halo planes of the outputs discarded
        # (identical machinery to _solve_nl_fused's sharded path — the
        # halo line's redundant solve is bitwise the owner's)
        spec3 = P(None, ax, None)
        spec4 = P(None, None, ax, None)
        fwd = [(i, i + 1) for i in range(nsh - 1)]
        bwd = [(i + 1, i) for i in range(nsh - 1)]

        def ext(arr, dim):
            first = jax.lax.slice_in_dim(arr, 0, 1, axis=dim)
            if nsh == 1:
                z = jnp.zeros_like(first)
                return jnp.concatenate([z, arr, z], axis=dim)
            last = jax.lax.slice_in_dim(arr, arr.shape[dim] - 1,
                                        arr.shape[dim], axis=dim)
            lh = jax.lax.ppermute(last, ax, fwd)
            rh = jax.lax.ppermute(first, ax, bwd)
            return jnp.concatenate([lh, arr, rh], axis=dim)

        def call(axis, t4_, r4_, o4_, gmerge):
            cls, bv, bt, cb, tb = masks[axis]
            has_dual = cb is not None
            db_specs = (spec3, spec3) if has_dual else ()

            @functools.partial(
                jax.shard_map, mesh=plan.mesh,
                in_specs=(spec4, spec3, spec3, spec3, spec4, spec4,
                          P(None)) + db_specs,
                out_specs=(spec4, spec4), check_vma=False)
            def krun(t4s, c3s, bvs, bts, r4s, o4s, scal_, *db):
                dkw = {}
                if db:
                    # dual masks halo-extend like cls (zero planes decode
                    # to identity rows, no dual/take flags)
                    dkw = dict(cls_b=ext(db[0], 1), take_b=ext(db[1], 1))
                o4x, t4x = fused_sweep_nl(
                    ext(t4s, 2), ext(c3s, 1), ext(bvs, 1), ext(bts, 1),
                    ext(r4s, 2), ext(o4s, 2), scal_, sweep_axis=0,
                    axis_var=axis, exact=exact, gmerge=gmerge, pcr=pcr,
                    **dkw)
                return o4x[:, :, 1:-1], t4x[:, :, 1:-1]

            db_args = (cb, tb) if has_dual else ()
            return krun(t4_, cls, bv, bt, r4_, o4_, scals[axis], *db_args)

    def run_dir(axis, temp4, rhs4, op4, gmerge_last):
        r4 = rhs4.astype(jnp.bfloat16) if bf16 else rhs4
        out4 = op4
        pairs = num_local // 2
        for k in range(pairs):
            o_in = out4.astype(jnp.bfloat16) if bf16 else out4
            o4, tn4 = call(axis, temp4, r4, o_in,
                           gmerge_last and k == pairs - 1)
            if bf16:
                o4 = o4.astype(f32)
                tn4 = tn4.astype(f32)
            temp4, out4 = tn4, o4
        return temp4, out4

    temp4 = cur4                                      # L_X
    curZ = t4(cur4, PX2Z)                             # Z's rhs, constant
    n4, nx, ny, nz = cur4.shape
    half4 = jnp.zeros((n4, ny, nx, nz), cur4.dtype)   # L_Y
    for _ in range(num_global):
        tZ, nxtZ = run_dir(2, t4(temp4, PX2Z), curZ, t4(nxt4, PX2Z),
                           gmerge_last=False)
        tY, half4 = run_dir(1, t4(tZ, PZ2Y), t4(nxtZ, PZ2Y), half4,
                            gmerge_last=False)
        temp4, nxt4 = run_dir(0, t4(tY, PY2X), t4(half4, PY2X),
                              t4(nxtZ, PZ2X), gmerge_last=True)
    if plan is not None:
        if ny0 != nxt4.shape[2]:
            nxt4 = nxt4[:, :, :ny0]
        # back to the canonical X split for the XLA ops around us
        nxt4 = jax.lax.with_sharding_constraint(
            nxt4, NamedSharding(plan.mesh, P(None, ax, None, None)))
    return nxt4


def _solve_direction_3d(axis: int, rhs: State3D, temp: State3D, out_layer: State3D,
                        ga: GridArrays3D, dt, num_local: int, pa: ParamsArgs3D,
                        backend: str, exact: bool, plan=None,
                        merge_ok: bool = False, gmerge: bool = False):
    """Reference SolveDirection (AdiSolver3D.cpp:564-666), CPU semantics."""
    n_sweep = rhs.u.shape[axis]
    path = _dir_path(axis, n_sweep, backend, merge_ok,
                     ga.cls_b[axis] is None, num_local, plan)
    nl_here = path in ("pair", "pair+stream")
    if path != "fallback":
        # under a mesh the Y/Z directions run per shard (nl-pair kernel
        # with halo pre-exchange, or the stream kernel); the X direction
        # runs the pair kernel on all_to_all-resharded lines when
        # num_local is even, else falls through to the per-iteration
        # fused_dma reshard path below
        out = out_layer
        n_left = num_local
        if nl_here:
            pairs = num_local // 2
            for k in range(pairs):
                # the gmerge fold applies only on the direction's FINAL
                # kernel call (no trailing odd stream iteration)
                g = gmerge and (k == pairs - 1) and num_local % 2 == 0
                temp, out = _solve_nl_fused(axis, rhs, temp, out, ga, dt,
                                            pa, exact, gmerge=g,
                                            bf16=(backend in ("fused_bf16", "fused_pcr_bf16")),
                                            pcr=(backend in ("fused_pcr", "fused_pcr_bf16")),
                                            plan=plan)
            n_left = num_local % 2
        fused_dir = functools.partial(
            _solve_stream_fused,
            bf16=(backend in ("fused_bf16", "fused_pcr_bf16")),
            plan=plan)
        for _ in range(n_left):
            temp, out = fused_dir(axis, rhs, temp, out, ga, dt, pa, exact)
        return temp, out

    is_in = ga.types == NodeType.IN
    # UpdateSegment writes every segment cell INCLUDING the BC endpoints into
    # the direction's output layer (AdiSolver3D.cpp:707-730); identity rows
    # (cells outside any segment, e.g. dropped boundary-touching runs) keep
    # their previous values.
    written = ga.cls_a[axis] != 0
    out = out_layer
    for _ in range(num_local):
        sol = _build_and_solve_3d(axis, rhs, temp, ga, dt, pa, backend, exact,
                                  plan=plan)
        out = State3D(*(jnp.where(written, s, o) for o, s in zip(out, sol)))
        temp = State3D(*(jnp.where(is_in, (t + o) / 2.0, t)
                         for t, o in zip(temp, out)))
    return temp, out


@functools.partial(jax.jit, static_argnames=("axis", "num_local", "backend",
                                             "exact", "merge_ok"))
def _profiled_dir(axis, rhs, temp, out, ga, dt, num_local, pa, backend,
                  exact, merge_ok):
    return _solve_direction_3d(axis, rhs, temp, out, ga, dt, num_local, pa,
                               backend, exact, None, merge_ok)


@jax.jit
def _profiled_seed(cur: State3D, nxt_prev: State3D, types):
    is_bv = (types == NodeType.BOUND) | (types == NodeType.VALVE)
    return State3D(*(jnp.where(is_bv, c, n) for c, n in zip(cur, nxt_prev)))


@jax.jit
def _profiled_gmerge(temp: State3D, nxt: State3D, types):
    is_in = types == NodeType.IN
    return State3D(*(jnp.where(is_in, (t + n) / 2.0, t)
                     for t, n in zip(temp, nxt)))


@jax.jit
def _profiled_err(nxt: State3D, types, pa: ParamsArgs3D):
    return stencil.div_error_3d(nxt.u, nxt.v, nxt.w, types,
                                pa.dx, pa.dy, pa.dz)


def adi_timestep_3d_profiled(cur: State3D, nxt_prev: State3D,
                             ga: GridArrays3D, dt, num_global: int,
                             num_local: int, pa: ParamsArgs3D, prof,
                             backend: str = "auto", exact: bool = True,
                             merge_ok: tuple = (False, False, False)):
    """Diagnostic variant of adi_timestep_3d: every direction-solve is its
    own dispatch, timed into ``prof`` under the reference's event names
    (CopyLayer, SolveSegments_Z/Y/X, MergeLayer, EvalDivError —
    src/Common/Profiler.h:44-134, AdiSolver3D.cpp:297-301, 606-632).

    Each section ends with a forced scalar fetch (the only reliable device
    sync through the axon tunnel), so per-event times attribute correctly
    at the cost of one round-trip per section — the same trade the
    reference makes with its per-event MPI_Barrier.  Single-chip only;
    numbers differ slightly from the fused single-jit step (no
    cross-direction XLA fusion, per-call tile padding), so use this to
    ATTRIBUTE time, and bench.py to measure totals.
    """
    if backend == "auto":
        backend = ("fused_nl" if jax.default_backend() == "tpu" else "scan")
    if backend == "fused_merge":
        backend = "fused_full"

    def fetch(state):
        float(jnp.sum(state.u))

    with prof.section("CopyLayer"):
        nxt = _profiled_seed(cur, nxt_prev, ga.types)
        fetch(nxt)
    temp = cur
    half = State3D(*(jnp.zeros_like(f) for f in cur))
    for _ in range(num_global):
        with prof.section("SolveSegments_Z"):
            temp, nxt = _profiled_dir(2, cur, temp, nxt, ga, dt, num_local,
                                      pa, backend, exact, merge_ok[2])
            fetch(temp)
        with prof.section("SolveSegments_Y"):
            temp, half = _profiled_dir(1, nxt, temp, half, ga, dt, num_local,
                                       pa, backend, exact, merge_ok[1])
            fetch(temp)
        with prof.section("SolveSegments_X"):
            temp, nxt = _profiled_dir(0, half, temp, nxt, ga, dt, num_local,
                                      pa, backend, exact, merge_ok[0])
            fetch(temp)
        with prof.section("MergeLayer"):
            temp = _profiled_gmerge(temp, nxt, ga.types)
            fetch(temp)
    with prof.section("EvalDivError"):
        err = _profiled_err(nxt, ga.types, pa)
        err = float(err)
    return nxt, err


@functools.partial(jax.jit,
                   static_argnames=("num_global", "num_local", "backend",
                                    "exact", "compute_error", "plan",
                                    "merge_ok"))
def adi_timestep_3d(cur: State3D, nxt_prev: State3D, ga: GridArrays3D, dt,
                    num_global: int, num_local: int, pa: ParamsArgs3D,
                    backend: str = "auto", exact: bool = True,
                    compute_error: bool = True, plan=None,
                    merge_ok: tuple = (False, False, False)):
    """One reference TimeStep (AdiSolver3D.cpp:306-391).

    Returns (new_cur, err).  ``nxt_prev`` is the persistent next layer (the
    reference swaps cur/next pointers each step; only BOUND/VALVE cells of it
    are re-seeded from cur before the sweeps).
    """
    if backend == "fused_merge":
        # retired round 3: the pallas_sweep_dma2 merge-fold kernel was
        # superseded by the streamed full-fusion kernel (same in-kernel
        # UpdateSegment+merge, strictly less HBM traffic, cross-block
        # pipelined — RESULTS.md round-2 A/B); the name stays as an alias
        backend = "fused_full"
    if plan is not None:
        # Sharded runs use the fused kernels via shard_map (the reference
        # runs its fused CUDA kernels inside the multi-GPU configuration
        # likewise, AdiSolver3D.cu:524-640): the num_local-pair kernel per
        # shard with a 1-plane halo pre-exchange for the Y/Z directions
        # (_solve_nl_fused, stream kernel for odd tails), the manual-DMA
        # sweep with an all_to_all reshard for X (_sharded_fused).  The
        # two-pass "pallas" backend would run on GSPMD-sharded row arrays
        # without a shard_map -> scan.
        if backend == "auto":
            backend = ("fused_nl" if jax.default_backend() == "tpu"
                       else "fused")
        elif backend == "pallas":
            backend = "scan"

    # step-level tile padding: the fused kernels need (x, y, z) padded to
    # (8, 128, 128) multiples; padding once per step (instead of per kernel
    # call) lets XLA drop every per-call pad/crop copy.  Identity rows make
    # padded cells inert; types pad with OUT.
    pad = _step_pad(cur.u.shape, backend, plan)
    if pad is not None:
        p3 = tuple((0, p) for p in pad)

        def pad3(a, val=0):
            return (None if a is None
                    else jnp.pad(a, p3, constant_values=val))

        cur = State3D(*(pad3(f) for f in cur))
        nxt_prev = State3D(*(pad3(f) for f in nxt_prev))
        ga = ga._replace(
            types=pad3(ga.types, NodeType.OUT),
            bc_vel=pad3(ga.bc_vel), bc_temp=pad3(ga.bc_temp),
            val_u=pad3(ga.val_u), val_v=pad3(ga.val_v),
            val_w=pad3(ga.val_w), val_T=pad3(ga.val_T),
            cls_a=tuple(pad3(c) for c in ga.cls_a),
            cls_b=tuple(pad3(c) for c in ga.cls_b),
            take_b=tuple(pad3(c) for c in ga.take_b))

    is_bv = (ga.types == NodeType.BOUND) | (ga.types == NodeType.VALVE)
    is_in = ga.types == NodeType.IN

    nxt = State3D(*(jnp.where(is_bv, c, n) for c, n in zip(cur, nxt_prev)))
    temp = cur
    if _nl_stacked_possible(cur.u.shape,
                            tuple(ga.cls_b[ax] is None for ax in range(3)),
                            backend, num_local, merge_ok, plan):
        # stacked-carry fast path: the whole num_global loop runs on 4-var
        # stacks in kernel layouts (see _nl_stacked_step); bitwise equal
        nxt4 = _nl_stacked_step(cur, nxt, ga, dt, num_global, num_local,
                                pa, exact,
                                backend in ("fused_bf16", "fused_pcr_bf16"),
                                backend in ("fused_pcr", "fused_pcr_bf16"),
                                plan=plan)
        nxt = State3D(nxt4[0], nxt4[1], nxt4[2], nxt4[3])
    else:
        half = State3D(*(jnp.zeros_like(f) for f in cur))

        # when the X direction ends on the num_local-pair kernel, the global
        # MergeLayer folds into that kernel's in-kernel merge (gmerge) and
        # the XLA pass below is skipped — same static predicate as dispatch
        gfold = (_nl_pair_active(0, cur.u.shape[0], backend, merge_ok[0],
                                 ga.cls_b[0] is None, num_local, plan)
                 and num_local % 2 == 0)
        for _ in range(num_global):
            temp, nxt = _solve_direction_3d(2, cur, temp, nxt, ga, dt,
                                            num_local, pa, backend, exact,
                                            plan, merge_ok[2])
            temp, half = _solve_direction_3d(1, nxt, temp, half, ga, dt,
                                             num_local, pa, backend, exact,
                                             plan, merge_ok[1])
            temp, nxt = _solve_direction_3d(0, half, temp, nxt, ga, dt,
                                            num_local, pa, backend, exact,
                                            plan, merge_ok[0], gmerge=gfold)
            if not gfold:
                temp = State3D(*(jnp.where(is_in, (t + n) / 2.0, t)
                                 for t, n in zip(temp, nxt)))

    if compute_error:
        err = stencil.div_error_3d(nxt.u, nxt.v, nxt.w, ga.types,
                                   pa.dx, pa.dy, pa.dz)
    else:
        err = jnp.float32(-1.0)
    if pad is not None:
        sl = tuple(slice(0, -p) if p else slice(None) for p in pad)
        nxt = State3D(*(f[sl] for f in nxt))
        if plan is not None:
            # re-pin the cropped fields to the canonical X-split (the
            # crop leaves GSPMD an implicit, possibly uneven sharding)
            nxt = State3D(*(plan.constrain_state(f) for f in nxt))
    return nxt, err
