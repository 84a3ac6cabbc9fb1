"""Per-cell cost curve of the chunked long-line kernel vs line length.

VERDICT r4 weak #4: 2D 2048^2 measured -15% per-cell vs 1024^2
(bench_logs/bench_2d2048_r4.log), attributed to the (c', d') HBM carry
staging growing faster than the chunk glue amortizes.  This probe
isolates the kernel (no step glue): one fused_sweep_long call per length
L in {288, 320, 512, 1024, 2048}, with the batch extent shrunk to hold
total cells ~constant (so absolute times stay comparable and each point
runs the same few hundred MB).  Prints ns/cell + the chunk split, then
the derived staged-fraction model column: cells in chunks
[0, n_chunks - n_res) pay the 16 B/cell/var (c', d') round-trip, the
last n_res chunks stay VMEM-resident (the round-5 resident-ring
generalization; CMCFS_LONG_RESIDENT=0 re-runs the curve on the round-2
two-resident behavior for the A/B).

Run on the TPU: python scripts/probe_longcurve.py [--reps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cells", type=float, default=64e6,
                    help="~total cells per point (batch extent adapts)")
    ap.add_argument("--lengths", default="288,320,512,1024,2048")
    args = ap.parse_args()

    from cmcfs_tpu.ops.pallas_sweep_long import fused_sweep_long, _pick_chunk
    from cmcfs_tpu.ops.sweep_common import LANES, S_TILE, ceil_to

    print(f"backend={jax.default_backend()} reps={args.reps}")
    rows = []
    for L in (int(s) for s in args.lengths.split(",")):
        C = LANES * 2                       # lane extent (256)
        B = max(S_TILE, int(round(args.cells / (L * C) / S_TILE)) * S_TILE)
        shape = (L, B, C)                   # sweep over axis 0
        cells = L * B * C
        key = jax.random.PRNGKey(L)
        k1, k2 = jax.random.split(key)
        adv = jax.random.uniform(k1, shape, jnp.float32, -0.1, 0.1)
        d4 = jax.random.uniform(k2, (4,) + shape, jnp.float32, 0.0, 1.0)
        cls = jnp.zeros(shape, jnp.int32)    # INTERIOR rows, ends clamped
        cls = cls.at[0].set(1).at[L - 1].set(2)     # BC0 / BC1
        bcv = jnp.zeros(shape, jnp.int32)
        bct = jnp.zeros(shape, jnp.int32)
        scal = jnp.asarray([0.05, 0.02, 33.3, 8.0], jnp.float32)

        n = ceil_to(ceil_to(L, S_TILE), 8)
        ch, n_res = _pick_chunk(n, ceil_to(C, LANES))
        n = ceil_to(n, ch)
        n_chunks = n // ch
        staged_frac = max(0, n_chunks - n_res) / n_chunks

        x = fused_sweep_long(adv, cls, bcv, bct, d4, scal, sweep_axis=0)
        sync(x[0])                           # compile + settle
        t0 = time.perf_counter()
        for _ in range(args.reps):
            x = fused_sweep_long(adv, cls, bcv, bct, d4, scal, sweep_axis=0)
            sync(x[0])                       # tunnel-safe sync (CLAUDE.md)
        dt = (time.perf_counter() - t0) / args.reps
        ns_cell = dt / cells * 1e9
        rows.append((L, B, ch, n_chunks, staged_frac, dt * 1e3, ns_cell))
        print(f"L={L:5d} batch={B:4d} ch={ch:4d} chunks={n_chunks} "
              f"res={n_res} staged={staged_frac:.2f} t={dt*1e3:8.2f} ms "
              f"ns/cell={ns_cell:7.3f}")

    base = rows[0][-1]
    print("\nrelative to first length:")
    for r in rows:
        print(f"L={r[0]:5d}: {r[-1]/base:6.3f}x  (staged {r[4]:.2f})")


if __name__ == "__main__":
    main()
