"""Batched tridiagonal solves.

Interchangeable backends over the same (a, b, c, d) row interface:

* ``scan``   — lax.scan with the reference's exact operation order
  (src/Common/Algorithms.h:21-38): two true divisions per row.  This is the
  parity backend; inside each decoupled block it reproduces the C solver's
  f32 arithmetic exactly.
* ``pallas`` — ops/pallas_tridiag.py: same recurrence, VMEM-resident blocks,
  batch on sublanes/lanes; the TPU hot path.
* ``pcr``    — parallel cyclic reduction: log2(n) fully-vectorized levels
  instead of the 2n-step serial Thomas chain.  NOT bitwise vs the
  reference (different elimination order; ~1 ulp-class drift on the
  diagonally-dominant ADI rows) — a throughput mode for silicon where the
  serial recurrence, not HBM traffic, is the binding term
  (docs/ROOFLINE.md §3: the recurrence floor is 7x below the traffic
  ceiling at v5e spec bandwidth).

Convention: the sweep runs along ``axis`` (default 0 — sweep-major layout is
what the TPU wants: batch contiguous in lanes).  The first row's ``a`` and
the last row's ``c`` are ignored (the reference zeroes c[n-1]; so do we).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _solve_leading_axis_scan(a, b, c, d, exact: bool):
    """Thomas along axis 0; batch = trailing axes."""
    c = c.at[-1].set(0.0)  # reference Algorithms.h:23

    c0 = c[0] / b[0]
    d0 = d[0] / b[0]

    def fwd(carry, row):
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

    (_, _), (c_all, d_all) = jax.lax.scan(fwd, (c0, d0), (a[1:], b[1:], c[1:], d[1:]))
    c_all = jnp.concatenate([c0[None], c_all], axis=0)
    d_all = jnp.concatenate([d0[None], d_all], axis=0)

    x_last = d_all[-1]

    def bwd(x_next, row):
        ci, di = row
        x = di - ci * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, x_last, (c_all[:-1], d_all[:-1]), reverse=True)
    return jnp.concatenate([xs, x_last[None]], axis=0)


def _solve_leading_axis_pcr(a, b, c, d, exact: bool):
    """Parallel cyclic reduction along axis 0; batch = trailing axes.

    Each level eliminates the +-s neighbors of every row simultaneously
    (out-of-range neighbors are identity rows), doubling the stride until
    every equation is decoupled: x = d/b.  Identity rows (a=c=0, b=1)
    behave exactly as in Thomas — a neighbor pulling one absorbs its d —
    so the dense masked-line formulation (ops/masks.py) carries over
    unchanged.  Sequential depth log2(n) vs Thomas's 2n; ~6x the flops,
    all full-width vector ops."""
    n = a.shape[0]
    a = a.at[0].set(0.0)
    c = c.at[-1].set(0.0)   # reference Algorithms.h:23

    def shift(x, k, fill):
        """result[i] = x[i + k] with out-of-range rows = ``fill``."""
        pad = jnp.full_like(x[:abs(k)], fill)
        return (jnp.concatenate([x[k:], pad], 0) if k > 0
                else jnp.concatenate([pad, x[:k]], 0))

    s = 1
    while s < n:
        am, bm, cm, dm = (shift(a, -s, 0.0), shift(b, -s, 1.0),
                          shift(c, -s, 0.0), shift(d, -s, 0.0))
        ap, bp, cp, dp = (shift(a, s, 0.0), shift(b, s, 1.0),
                          shift(c, s, 0.0), shift(d, s, 0.0))
        if exact:
            alpha = -a / bm
            gamma = -c / bp
        else:
            alpha = -a * (1.0 / bm)
            gamma = -c * (1.0 / bp)
        b = b + alpha * cm + gamma * ap
        d = d + alpha * dm + gamma * dp
        a = alpha * am
        c = gamma * cp
        s *= 2
    return d / b if exact else d * (1.0 / b)


@functools.partial(jax.jit, static_argnames=("axis", "exact", "backend"))
def tridiag_solve(a, b, c, d, axis: int = 0, exact: bool = True,
                  backend: str = "auto"):
    """Solve a*x[i-1] + b*x[i] + c*x[i+1] = d along ``axis`` for a full batch.

    ``backend``: "scan" | "pallas" | "auto" (pallas on TPU, scan elsewhere).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if axis != 0:
        a = jnp.moveaxis(a, axis, 0)
        b = jnp.moveaxis(b, axis, 0)
        c = jnp.moveaxis(c, axis, 0)
        d = jnp.moveaxis(d, axis, 0)
        x = tridiag_solve(a, b, c, d, axis=0, exact=exact, backend=backend)
        return jnp.moveaxis(x, 0, axis)

    if backend == "pallas":
        from .pallas_tridiag import tridiag_pallas
        return tridiag_pallas(a, b, c, d, exact=exact)
    if backend == "pcr":
        return _solve_leading_axis_pcr(a, b, c, d, exact)
    return _solve_leading_axis_scan(a, b, c, d, exact)
