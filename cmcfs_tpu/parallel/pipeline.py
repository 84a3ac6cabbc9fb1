"""Pipelined distributed Thomas along the sharded X axis.

This is the faithful TPU equivalent of the reference's cross-device X solve
(AdiSolver3D.cu:524-640): forward elimination flows device -> device carrying
the per-line (c', d') boundary values, back substitution flows the other way
carrying x — ppermute replaces cudaMemcpyPeer/MPI.  Expressed in SPMD, every
device evaluates every pipeline stage and keeps only its own (the pipeline
bubble the reference hides with Z-blocking appears here as K-fold redundant
compute), so the all_to_all reshard strategy (parallel/mesh.py) is normally
faster; this implementation exists as the measured alternative and as the
building block for a Z-blocked wavefront in a later round.

Numerics: identical recurrences to ops/tridiag thomas (exact division order);
the first row of the global line must have a == 0 and the last row c == 0 —
our dense row builders guarantee both (BC0/identity rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def _local_fwd(a, b, c, d, cin_c, cin_d, exact):
    """Local forward elimination given the incoming carry planes."""
    def step(carry, row):
        c_prev, d_prev = carry
        ai, bi, ci, di = row
        denom = bi - ai * c_prev
        if exact:
            c_new = ci / denom
            d_new = (di - d_prev * ai) / denom
        else:
            r = 1.0 / denom
            c_new = ci * r
            d_new = (di - d_prev * ai) * r
        return (c_new, d_new), (c_new, d_new)

    (oc, od), (cp, dp) = jax.lax.scan(step, (cin_c, cin_d), (a, b, c, d))
    return cp, dp, oc, od


def _local_bwd(cp, dp, xin):
    def step(x_next, row):
        ci, di = row
        x = di - ci * x_next
        return x, x

    ox, xs = jax.lax.scan(step, xin, (cp, dp), reverse=True)
    return xs, ox


def _largest_divisor_leq(n: int, m: int) -> int:
    for k in range(min(n, m), 0, -1):
        if n % k == 0:
            return k
    return 1


def pipelined_tridiag_x_blocked(a, b, c, d, plan, nblockz: int,
                                exact: bool = True):
    """Z-blocked wavefront pipeline (the reference's ``blocking nBlockZ``,
    AdiSolver3D.cu:642-881).

    The batch's LAST axis is split into ``nb`` blocks; at wavefront step t
    device k processes block t-k, so device k starts block 0 as soon as
    device k-1 hands over that block's carry instead of waiting for the
    whole batch.  Per-device compute drops from K×batch (the plain SPMD
    pipeline's redundancy) to (K+nb-1)/nb × batch — the same bubble-hiding
    the reference gets from overlapping block b's Y-solve with the X
    pipeline of block b-1.  Numerics are identical to pipelined_tridiag_x
    (each line is independent; blocking only reorders schedule).
    """
    mesh = plan.mesh
    axk = plan.axis
    spec = P(axk)
    K = mesh.devices.size
    nz = a.shape[-1]
    nb = _largest_divisor_leq(nz, max(1, nblockz))
    blk = nz // nb
    T = K + nb - 1

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,) * 4,
                       out_specs=spec)
    def solve(a, b, c, d):
        k = jax.lax.axis_index(axk)
        # derived from shard data: varying over the mesh axis (scan carries
        # must keep a consistent varying-axes type)
        czero = a[0, ..., :blk] * 0.0

        c_local = c.at[-1].set(jnp.where(k == K - 1, 0.0, c[-1]))

        fwd_perm = [(i, i + 1) for i in range(K - 1)]
        bwd_perm = [(i + 1, i) for i in range(K - 1)]

        def blk_slice(m, off):
            return jax.lax.dynamic_slice_in_dim(m, off, blk, axis=m.ndim - 1)

        def blk_update(m, val, off):
            return jax.lax.dynamic_update_slice_in_dim(m, val, off,
                                                       axis=m.ndim - 1)

        def fwd_stage(t, state):
            cin_c, cin_d, cp, dp = state
            bidx = t - k
            valid = (bidx >= 0) & (bidx < nb)
            off = jnp.clip(bidx, 0, nb - 1) * blk
            asl, bsl, csl, dsl = (blk_slice(m, off)
                                  for m in (a, b, c_local, d))
            ncp, ndp, oc, od = _local_fwd(asl, bsl, csl, dsl, cin_c, cin_d,
                                          exact)
            cp = blk_update(cp, jnp.where(valid, ncp, blk_slice(cp, off)), off)
            dp = blk_update(dp, jnp.where(valid, ndp, blk_slice(dp, off)), off)
            cin_c = jax.lax.ppermute(oc, axk, fwd_perm)
            cin_d = jax.lax.ppermute(od, axk, fwd_perm)
            return cin_c, cin_d, cp, dp

        init = (czero, czero, jnp.zeros_like(a), jnp.zeros_like(a))
        _, _, cp, dp = jax.lax.fori_loop(0, T, fwd_stage, init)

        def bwd_stage(t, state):
            xin, xs = state
            bidx = t - (K - 1 - k)
            valid = (bidx >= 0) & (bidx < nb)
            off = jnp.clip(bidx, 0, nb - 1) * blk
            nxs, ox = _local_bwd(blk_slice(cp, off), blk_slice(dp, off), xin)
            xs = blk_update(xs, jnp.where(valid, nxs, blk_slice(xs, off)), off)
            xin = jax.lax.ppermute(ox, axk, bwd_perm)
            return xin, xs

        _, xs = jax.lax.fori_loop(0, T, bwd_stage,
                                  (czero, jnp.zeros_like(a)))
        return xs

    return solve(a, b, c, d)


def pipelined_tridiag_x(a, b, c, d, plan, exact: bool = True):
    """Solve along axis 0 of X-sharded (X, ...) row arrays via the pipeline."""
    mesh = plan.mesh
    ax = plan.axis
    spec = P(ax)
    K = mesh.devices.size

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,) * 4,
                       out_specs=spec)
    def solve(a, b, c, d):
        k = jax.lax.axis_index(ax)
        zero = a[0] * 0.0   # derived from shard data: varying over the mesh axis

        c_local = c.at[-1].set(jnp.where(k == K - 1, 0.0, c[-1]))

        fwd_perm = [(i, i + 1) for i in range(K - 1)]
        bwd_perm = [(i + 1, i) for i in range(K - 1)]

        def fwd_stage(s, state):
            cin_c, cin_d, cp, dp, out_c, out_d = state
            ncp, ndp, oc, od = _local_fwd(a, b, c_local, d, cin_c, cin_d, exact)
            keep = k == s
            cp = jnp.where(keep, ncp, cp)
            dp = jnp.where(keep, ndp, dp)
            out_c = jnp.where(keep, oc, out_c)
            out_d = jnp.where(keep, od, out_d)
            cin_c = jax.lax.ppermute(out_c, ax, fwd_perm)
            cin_d = jax.lax.ppermute(out_d, ax, fwd_perm)
            return cin_c, cin_d, cp, dp, out_c, out_d

        init = (zero, zero, jnp.zeros_like(a), jnp.zeros_like(a), zero, zero)
        _, _, cp, dp, _, _ = jax.lax.fori_loop(0, K, fwd_stage, init)

        def bwd_stage(s, state):
            xin, xs, out_x = state
            nxs, ox = _local_bwd(cp, dp, xin)
            keep = k == (K - 1 - s)
            xs = jnp.where(keep, nxs, xs)
            out_x = jnp.where(keep, ox, out_x)
            xin = jax.lax.ppermute(out_x, ax, bwd_perm)
            return xin, xs, out_x

        # global last row: x = d' (its c' is zero, the zero xin is exact)
        _, xs, _ = jax.lax.fori_loop(0, K, bwd_stage,
                                     (zero, jnp.zeros_like(a), zero))
        return xs

    return solve(a, b, c, d)
