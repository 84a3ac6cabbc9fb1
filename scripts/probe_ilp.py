"""Microbenchmark: is the fused sweep's serial row loop latency-bound on
carried dependencies (so interleaving the 4 independent per-variable
recurrence chains into ONE loop would pipeline them), or issue-bound (so
merging only saves the shared pk-decode/coefficient work)?

Two pallas kernels over the same (n, 8, 128) f32 slabs, same total math:
  seq:  4 separate chunked loops, each one Thomas-like carried chain
        (num = d - prev*a; new = num * r)  — the current kernel structure;
  ilp:  ONE chunked loop carrying all 4 chains (shared row reads of a/r).

Run on the TPU:  python scripts/probe_ilp.py [--n 256] [--reps 50]
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
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--chains", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, nb, K = args.n, args.blocks, args.chains
    slab = (n, 8, 128)

    def chunked(fn, init):
        def chunk(k, carry):
            base = k * 8
            for i in range(8):
                carry = fn(base + i, carry)
            return carry

        return jax.lax.fori_loop(0, n // 8, chunk, init)

    def make_kernel(ilp: bool):
        def body(a_hbm, r_hbm, d_hbm, o_hbm, a_v, r_v, d_v, o_v, sems):
            b = pl.program_id(0)
            cp = pltpu.make_async_copy

            def ld(hbm, v, sem):
                return cp(hbm.at[pl.ds(b * n, n)], v, sem)

            ld(a_hbm, a_v, sems.at[0]).start()
            ld(r_hbm, r_v, sems.at[1]).start()
            for q in range(K):
                cp(d_hbm.at[q, pl.ds(b * n, n)], d_v.at[q],
                   sems.at[2 + q]).start()
            ld(a_hbm, a_v, sems.at[0]).wait()
            ld(r_hbm, r_v, sems.at[1]).wait()
            for q in range(K):
                cp(d_hbm.at[q, pl.ds(b * n, n)], d_v.at[q],
                   sems.at[2 + q]).wait()

            zero = jnp.zeros((8, 128), jnp.float32)
            if ilp:
                def fbody(p, prev):
                    a = a_v[p]
                    r = r_v[p]
                    out = []
                    for q in range(K):
                        num = d_v[q, p] - prev[q] * a
                        new = num * r
                        o_v[q, p] = new
                        out.append(new)
                    return tuple(out)

                chunked(fbody, (zero,) * K)
            else:
                for q in range(K):
                    def fbody(p, prev, q=q):
                        num = d_v[q, p] - prev * a_v[p]
                        new = num * r_v[p]
                        o_v[q, p] = new
                        return new

                    chunked(fbody, zero)

            for q in range(K):
                cp(o_v.at[q], o_hbm.at[q, pl.ds(b * n, n)],
                   sems.at[2 + q]).start()
            for q in range(K):
                cp(o_v.at[q], o_hbm.at[q, pl.ds(b * n, n)],
                   sems.at[2 + q]).wait()

        return body

    @functools.partial(jax.jit, static_argnames=("ilp",))
    def run(a, r, d, ilp):
        return pl.pallas_call(
            make_kernel(ilp),
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((K, n * nb, 8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM((K,) + slab, jnp.float32),
                pltpu.VMEM((K,) + slab, jnp.float32),
                pltpu.SemaphoreType.DMA((2 + K,)),
            ],
            interpret=(jax.default_backend() != "tpu"),
        )(a, r, d)

    key = jax.random.PRNGKey(0)
    ka, kr, kd = jax.random.split(key, 3)
    a = jax.random.uniform(ka, (n * nb, 8, 128), jnp.float32, 0.1, 0.2)
    r = jax.random.uniform(kr, (n * nb, 8, 128), jnp.float32, 0.9, 1.1)
    d = jax.random.uniform(kd, (K, n * nb, 8, 128), jnp.float32)

    print(f"device={jax.devices()[0]}  n={n} blocks={nb} chains={K} "
          f"({K * n * nb} chain-steps of (8,128))")
    outs = {}
    for name, ilp in (("seq", False), ("ilp", True)):
        o = run(a, r, d, ilp)
        outs[name] = float(jnp.sum(o))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                o = run(a, r, d, ilp)
            float(jnp.sum(o))
            dt = (time.time() - t0) / args.reps
            best = min(best, dt)
        steps = K * n * nb
        print(f"  {name}: {best * 1e3:8.3f} ms  "
              f"({best / steps * 1e9:6.2f} ns/chain-step)")
    print(f"  checksum |seq-ilp| = {abs(outs['seq'] - outs['ilp']):.2e}")


if __name__ == "__main__":
    main()
