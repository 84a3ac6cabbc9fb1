"""Probe: is an in-kernel (Mosaic) dissipation stencil bitwise-identical to
the XLA-compiled stencil.diss_*_3d?

The planned num_local-fused kernel (pallas_sweep_nl.py) must recompute the
T-equation forcing t_phi*diss(temp_new1) INSIDE the kernel for the second
local iteration; the backends' bitwise-vs-scan guarantee then hinges on
Mosaic and XLA producing identical f32 results for the same derivative
formula (mul-by-reciprocal vs divide, FMA contraction).  This probe
computes diss_x on one (A, 8, 128) slab both ways and diffs bit patterns.

Run on the TPU: python scripts/probe_diss_bitwise.py  [--n 128]
(CPU/interpret mode is expected to show ~1-ulp FMA differences.)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(scal_ref, u_ref, v_ref, w_ref, out_ref):
    inv2hx = scal_ref[0]
    inv2hy = scal_ref[1]
    inv2hz = scal_ref[2]
    u = u_ref[...]
    v = v_ref[...]
    w = w_ref[...]
    n = u.shape[0]

    def dx(f):
        # sweep-axis derivative: interior rows only (edges get a clamped
        # neighbor — masked downstream in the real kernel)
        fp = jnp.concatenate([f[1:], f[n - 1:]], axis=0)
        fm = jnp.concatenate([f[:1], f[:n - 1]], axis=0)
        return (fp - fm) * inv2hx

    def dy(f):
        fp = jnp.concatenate([f[:, 1:, :], f[:, 7:8, :]], axis=1)
        fm = jnp.concatenate([f[:, 0:1, :], f[:, :7, :]], axis=1)
        return (fp - fm) * inv2hy

    def dz(f):
        fp = jnp.concatenate([f[:, :, 1:], f[:, :, 127:128]], axis=2)
        fm = jnp.concatenate([f[:, :, 0:1], f[:, :, :127]], axis=2)
        return (fp - fm) * inv2hz

    ux = dx(u)
    vx = dx(v)
    wx = dx(w)
    uy = dy(u)
    uz = dz(u)
    out_ref[...] = 2 * ux * ux + vx * vx + wx * wx + vx * uy + wx * uz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    args = ap.parse_args()
    n = args.n
    key = jax.random.PRNGKey(0)
    shape = (n, 8, 128)
    u, v, w = (jax.random.uniform(k, shape, jnp.float32, -1, 1)
               for k in jax.random.split(key, 3))
    dxh, dyh, dzh = 0.00409, 0.0037, 0.0041
    scal = jnp.array([1.0 / (2 * dxh), 1.0 / (2 * dyh), 1.0 / (2 * dzh)],
                     jnp.float32)

    got = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=(jax.default_backend() != "tpu"),
    )(scal, u, v, w)

    from cmcfs_tpu.ops import stencil

    @jax.jit
    def ref(u, v, w):
        return stencil.diss_x_3d(u, v, w, dxh, dyh, dzh)

    want = ref(u, v, w)
    # compare interior cells only (the kernel clamps edges, stencil wraps)
    gi = np.asarray(got)[1:-1, 1:-1, 1:-1]
    wi = np.asarray(want)[1:-1, 1:-1, 1:-1]
    same = (gi.view(np.int32) == wi.view(np.int32))
    rel = np.abs(gi - wi) / np.maximum(np.abs(wi), 1e-20)
    print(f"backend={jax.default_backend()}  bitwise={same.all()}  "
          f"mismatch_frac={1 - same.mean():.2e}  max_rel={rel.max():.3e}")


if __name__ == "__main__":
    main()
