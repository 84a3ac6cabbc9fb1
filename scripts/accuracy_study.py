"""f32 rounding-sensitivity study on the 3D ADI step (BASELINE.md config 4).

TPUs have no native f64, so the study quantifies how far each fast-path
precision knob drifts from the exact-order f32 scan over a rollout:

  * exact=True  vs exact=False   (true division vs Newton reciprocal in the
                                  Thomas recurrence — the kernels' fast mode)
  * fused_dma (f32)              (kernel op-order/FMA differences)
  * fused_bf16                   (bf16 RHS/solution storage, f32 recurrence)

The C reference itself computes in f32 (float fields throughout,
src/FluidSolver3D/TimeLayer3D.h), so f32-scan *is* the parity oracle;
C-vs-scan drift over 1000 steps is gated separately (test_parity_long.py,
RESULTS.md).  Run on the TPU:  python scripts/accuracy_study.py [--n 96]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--every", type=int, default=20)
    args = ap.parse_args()

    import jax.numpy as jnp
    import __graft_entry__ as g
    from cmcfs_tpu.models import adi3d

    _, ga, cur, pa = g._setup(args.n, args.n, args.n, "scan")
    dt = jnp.float32(0.01)

    variants = {
        "scan exact": dict(backend="scan", exact=True),
        "scan approx-recip": dict(backend="scan", exact=False),
        "fused_dma f32": dict(backend="fused_dma", exact=True),
        "fused_bf16": dict(backend="fused_bf16", exact=True),
    }
    states = {k: cur for k in variants}

    def rel(a, b):
        scale = np.abs(np.asarray(b)).max() + 1e-30
        return float(np.abs(np.asarray(a) - np.asarray(b)).max() / scale)

    print(f"grid {args.n}^3, ng=2 nl=2, drift of max|Δu|/max|u| vs 'scan exact'")
    hdr = ["step"] + [k for k in variants if k != "scan exact"]
    print(",".join(hdr))
    for s in range(1, args.steps + 1):
        for k, kw in variants.items():
            st, _ = adi3d.adi_timestep_3d(states[k], states[k], ga, dt, 2, 2,
                                          pa, compute_error=False, **kw)
            states[k] = st
        if s % args.every == 0 or s == 1:
            ref = states["scan exact"].u
            row = [str(s)] + [f"{rel(states[k].u, ref):.3e}"
                              for k in variants if k != "scan exact"]
            print(",".join(row), flush=True)


if __name__ == "__main__":
    main()
