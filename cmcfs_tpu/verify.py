"""Backend cross-check driver: run one case on two backends, diff results.

    python -m cmcfs_tpu.verify <input> <config> [A B] [align] [shards N]

Runs the case end-to-end on backends A and B (default: scan vs the
platform's fused default), then compares the full output trajectories
record-by-record and the divergence-error sequences.  This is the
framework's backend-vs-backend oracle as a user-facing tool (the reference
developers did the same by diffing layer checksums between CPU and GPU
builds — the commented sum_layer probes, AdiSolver3D.cpp:30-58).
"""
from __future__ import annotations

import sys
import tempfile

import numpy as np


def verify_3d(input_path: str, config_path: str, be_a: str, be_b: str,
              align: bool = False, shards: int = 1,
              max_steps: int | None = None) -> int:
    from .cli3d import run_case
    from .io.netcdf3 import NetCDF3Reader

    tmp = tempfile.mkdtemp(prefix="cmcfs_verify_")
    outs = {}
    errs = {}
    for be in (be_a, be_b):
        base = f"{tmp}/{be}"
        _, e = run_case(input_path, base, config_path, align=align,
                        backend=be, quiet=True, collect_errs=True,
                        shards=shards if be == be_b else 1,
                        max_steps=max_steps)
        outs[be] = base + "_res.nc"
        errs[be] = e
    ra = NetCDF3Reader(outs[be_a])
    rb = NetCDF3Reader(outs[be_b])
    worst = 0.0
    rc = 0
    for var in "uvwT":
        a = ra.read(var)
        b = rb.read(var)
        if a.shape != b.shape:
            print(f"{var}: record shape mismatch {a.shape} vs {b.shape}")
            rc = 1
            continue
        for rec in range(len(a)):
            real = a[rec] < 9e4
            if not (real == (b[rec] < 9e4)).all():
                print(f"{var} rec {rec}: MISSING masks differ")
                rc = 1
                continue
            scale = max(np.abs(a[rec][real]).max(), 1e-30)
            rel = float(np.abs(a[rec] - b[rec])[real].max() / scale)
            worst = max(worst, rel)
            mark = "" if rel < 1e-5 else "   <-- above 1e-5"
            print(f"{var} rec {rec}: rel diff {rel:.3e}{mark}")
            if rel >= 1e-5:
                rc = 1
    ed = max((abs(x - y) for x, y in zip(errs[be_a], errs[be_b])),
             default=0.0)
    print(f"div-err sequence max |diff| = {ed:.3e}")
    print(f"worst relative field diff   = {worst:.3e}  "
          f"[{be_a} vs {be_b}] -> {'OK' if rc == 0 else 'MISMATCH'}")
    return rc


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    flags = {"align": False}
    shards = 1
    max_steps = None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] in flags:
            flags[argv[i]] = True
        elif argv[i] == "shards" and i + 1 < len(argv):
            shards = int(argv[i + 1]); i += 1
        elif argv[i] == "steps" and i + 1 < len(argv):
            max_steps = int(argv[i + 1]); i += 1
        else:
            rest.append(argv[i])
        i += 1
    if len(rest) < 2:
        print(__doc__)
        return 2
    import jax
    default_fast = "fused_dma" if jax.default_backend() == "tpu" else "fused"
    be_a = rest[2] if len(rest) > 2 else "scan"
    be_b = rest[3] if len(rest) > 3 else default_fast
    return verify_3d(rest[0], rest[1], be_a, be_b, align=flags["align"],
                     shards=shards, max_steps=max_steps)


if __name__ == "__main__":
    sys.exit(main())
