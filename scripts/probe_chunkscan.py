"""Chunk-size scan for the chunked long-line kernel at the EXACT 2D bench
shapes (VERDICT r4 weak #4, the 2048^2 -15%/cell regression).

The 2D solver reshapes the batch to (bp//128, 128) lanes, so the kernel
sees C=128 — NOT the 256+ lanes the longcurve probe models.  At C=128
the (c', d') ring fits MANY chunks, and the chunk choice trades seam
overhead against intra-line pipelining: a single big chunk (what
_pick_chunk's staging-only cost model picks at these shapes) exposes the
whole input DMA burst with zero overlap, while ch~128-256 streams chunk
k+1 in during chunk k's serial row loop.  This scan measures the real
optimum per shape; _pick_chunk's model is then fit to it.

Shapes: (1024, 8, 128) == the 1024^2 X sweep; (2048, 16, 128) == 2048^2;
(512, 64, 128) == a 512-long sharded-3D-class sweep at wide batch.

Run on the TPU: python scripts/probe_chunkscan.py [--reps 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--nvars", type=int, default=3,
                    help="3 = the 2D solver's (U,V,T)")
    args = ap.parse_args()

    from cmcfs_tpu.ops.pallas_sweep_long import fused_sweep_long, _pick_chunk
    from cmcfs_tpu.ops.sweep_common import LANES, ceil_to

    print(f"backend={jax.default_backend()} reps={args.reps} "
          f"nvars={args.nvars}")
    shapes = [(1024, 8, 128), (2048, 16, 128), (512, 64, 128)]
    for L, B, C in shapes:
        cells = L * B * C
        key = jax.random.PRNGKey(L + B)
        k1, k2 = jax.random.split(key)
        shape = (L, B, C)
        adv = jax.random.uniform(k1, shape, jnp.float32, -0.1, 0.1)
        d4 = jax.random.uniform(k2, (args.nvars,) + shape, jnp.float32,
                                0.0, 1.0)
        cls = jnp.zeros(shape, jnp.int32)
        cls = cls.at[0].set(1).at[L - 1].set(2)
        bcv = jnp.zeros(shape, jnp.int32)
        bct = jnp.zeros(shape, jnp.int32)
        scal = jnp.asarray([0.05, 0.02, 33.3, 8.0], jnp.float32)

        auto = _pick_chunk(L, ceil_to(C, LANES))
        print(f"\nshape {shape} ({cells/1e6:.1f}M cells) "
              f"auto-pick (ch,R)={auto}")
        # skip chunk sizes whose fixed streams + minimal ring exceed the
        # VMEM budget (fused_sweep_long clamps them to the same cap, so
        # scanning them would duplicate the capped point)
        u = 8 * ceil_to(C, LANES) * 4
        from cmcfs_tpu.ops.pallas_sweep_long import VMEM_BUDGET
        cap = max(8, (VMEM_BUDGET // (u * 10)) // 8 * 8)
        chunks = sorted({min(c, cap) for c in (64, 128, 256, 512, 1024, L)
                         if 64 <= c <= L})
        best = None
        for ch in chunks:
            x = fused_sweep_long(adv, cls, bcv, bct, d4, scal,
                                 sweep_axis=0, chunk=ch)
            sync(x[0])
            t0 = time.perf_counter()
            for _ in range(args.reps):
                x = fused_sweep_long(adv, cls, bcv, bct, d4, scal,
                                     sweep_axis=0, chunk=ch)
                sync(x[0])
            dt = (time.perf_counter() - t0) / args.reps
            ns_cell = dt / cells * 1e9
            m = -(-ceil_to(L, ch) // ch)
            tag = " <= auto" if ch == auto[0] else ""
            print(f"  ch={ch:5d} chunks={m:3d}: {dt*1e3:8.3f} ms  "
                  f"ns/cell={ns_cell:7.3f}{tag}")
            if best is None or dt < best[1]:
                best = (ch, dt)
        print(f"  BEST ch={best[0]} ({best[1]*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
