"""What does one serial row-loop step actually cost on this chip?

Variants (all same total cells processed, Thomas-like carried chain):
  base   : rows (8,128), 1 chain   — the current kernel granularity
  noload : same loop, carry-only math (no VMEM row reads/writes)
  wide_l : rows (8,256)  — 2 vregs per step along lanes, half the blocks
  wide_j : rows (16,128) — 2 vregs per step along sublanes
  wide4  : rows (8,512)  — 4 vregs per step along lanes

Run on the TPU:  python scripts/probe_rowcost.py [--n 256] [--reps 20]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--cells", type=int, default=256 * 64 * 8 * 128)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = args.n

    def chunked(fn, init):
        def chunk(k, carry):
            base = k * 8
            for i in range(8):
                carry = fn(base + i, carry)
            return carry

        return jax.lax.fori_loop(0, n // 8, chunk, init)

    def make_kernel(sub, lanes, noload):
        slab = (n, sub, lanes)

        def body(a_hbm, r_hbm, d_hbm, o_hbm, a_v, r_v, d_v, o_v, sems):
            b = pl.program_id(0)
            cp = pltpu.make_async_copy

            def ld(hbm, v, s):
                return cp(hbm.at[pl.ds(b * n, n)], v, sems.at[s])

            ld(a_hbm, a_v, 0).start()
            ld(r_hbm, r_v, 1).start()
            ld(d_hbm, d_v, 2).start()
            ld(a_hbm, a_v, 0).wait()
            ld(r_hbm, r_v, 1).wait()
            ld(d_hbm, d_v, 2).wait()

            zero = jnp.zeros((sub, lanes), jnp.float32)
            if noload:
                a0 = a_v[0]
                r0 = r_v[0]
                d0 = d_v[0]

                def fbody(p, prev):
                    num = d0 - prev * a0
                    return num * r0

                res = chunked(fbody, zero)
                o_v[0] = res
            else:
                def fbody(p, prev):
                    num = d_v[p] - prev * a_v[p]
                    new = num * r_v[p]
                    o_v[p] = new
                    return new

                chunked(fbody, zero)

            cp(o_v, o_hbm.at[pl.ds(b * n, n)], sems.at[3]).start()
            cp(o_v, o_hbm.at[pl.ds(b * n, n)], sems.at[3]).wait()

        return body, slab

    @functools.partial(jax.jit, static_argnames=("sub", "lanes", "noload",
                                                 "nb"))
    def run(a, r, d, sub, lanes, noload, nb):
        body, slab = make_kernel(sub, lanes, noload)
        return pl.pallas_call(
            body,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n * nb, sub, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=(jax.default_backend() != "tpu"),
        )(a, r, d)

    variants = [
        ("base", 8, 128, False),
        ("noload", 8, 128, True),
        ("wide_j", 16, 128, False),
        ("wide_l", 8, 256, False),
        ("wide4", 8, 512, False),
    ]
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]}  n={n}  total cells/run "
          f"{args.cells/1e6:.1f}M")
    for name, sub, lanes, noload in variants:
        nb = args.cells // (n * sub * lanes)
        ka, kr, kd = jax.random.split(key, 3)
        shape = (n * nb, sub, lanes)
        a = jax.random.uniform(ka, shape, jnp.float32, 0.1, 0.2)
        r = jax.random.uniform(kr, shape, jnp.float32, 0.9, 1.1)
        d = jax.random.uniform(kd, shape, jnp.float32)
        o = run(a, r, d, sub, lanes, noload, nb)
        float(jnp.sum(o))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                o = run(a, r, d, sub, lanes, noload, nb)
            float(jnp.sum(o))
            dt = (time.time() - t0) / args.reps
            best = min(best, dt)
        steps = n * nb
        print(f"  {name:7s} sub={sub:3d} lanes={lanes:3d} nb={nb:3d}: "
              f"{best * 1e3:8.3f} ms  ({best / steps * 1e9:6.2f} ns/step, "
              f"{args.cells / best / 1e9:6.2f} Gcell/s)")


if __name__ == "__main__":
    main()
