"""Interleaved kernel A/B: the working-tree fused_dma kernel vs a git
revision of it (staged as cmcfs_tpu/ops/_old_dma_ab.py for the run).

Run on the TPU: python scripts/ab_dma.py [--n 256] [--reps 3] [--ref <rev>]

Caveat (measured 2026-08-16): single-invocation timings through the tunnel
carry a constant sync overhead and can invert step-level rankings — confirm
any win with an interleaved `python bench.py` A/B before changing defaults.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def _stage_ref(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:cmcfs_tpu/ops/pallas_sweep_dma.py"],
        cwd=ROOT, capture_output=True, text=True, check=True).stdout
    path = os.path.join(ROOT, "cmcfs_tpu", "ops", "_old_dma_ab.py")
    with open(path, "w") as f:
        f.write(src)
    return path


_ap0 = argparse.ArgumentParser(add_help=False)
_ap0.add_argument("--ref", default="HEAD~1")
_ref = _ap0.parse_known_args()[0].ref
_stage = _stage_ref(_ref)

from cmcfs_tpu.ops.pallas_sweep_dma import fused_sweep_dma as new_k
from cmcfs_tpu.ops._old_dma_ab import fused_sweep_dma as old_k


def sync(x):
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--axis", type=int, default=0)
    ap.add_argument("--s_tile", type=int, default=8)
    args = ap.parse_args()
    n = args.n
    key = jax.random.PRNGKey(0)
    adv = jax.random.uniform(key, (n, n, n), jnp.float32, -1, 1)
    cls = jnp.ones((n, n, n), jnp.int32)
    cls = cls.at[0].set(2).at[-1].set(3)          # BC rows at the line ends
    bcv = jnp.zeros((n, n, n), jnp.int32)
    bct = jnp.zeros((n, n, n), jnp.int32)
    d4 = jax.random.uniform(key, (4, n, n, n), jnp.float32, -1, 1)
    scal = jnp.array([0.1, 0.2, 3.0, 0.5], jnp.float32)

    import inspect

    def run(k):
        # older staged revisions may predate newer keyword args (s_tile,
        # t_var, bc2d, ...): pass only what the staged signature accepts
        kw = dict(sweep_axis=args.axis, exact=True, s_tile=args.s_tile)
        sig = inspect.signature(k)
        kw = {n: v for n, v in kw.items() if n in sig.parameters}
        return k(adv, cls, bcv, bct, d4, scal, **kw)

    xo = run(old_k); so = sync(xo)
    xn = run(new_k); sn = sync(xn)
    print(f"checksums old={so:.6f} new={sn:.6f} match={so == sn}")

    times = {"old": [], "new": []}
    for rep in range(args.reps):
        for name, k in (("old", old_k), ("new", new_k)):
            t0 = time.time()
            sync(run(k))
            times[name].append((time.time() - t0) * 1e3)
    for name, ts in times.items():
        print(f"{name}: {min(ts):7.2f} ms (min of {args.reps})  all="
              + " ".join(f"{t:.1f}" for t in ts))


if __name__ == "__main__":
    main()
