"""1000-step fidelity gate on the PRODUCTION backend (fused_nl, real TPU).

The committed round-2 gate (bench_logs/longgate_r2.log) ran the scan
backend on CPU; this runs the same box_pipe 1000-step case through the
TPU default backend and diffs every record against the C reference.

Usage:
  python scripts/longgate_fusednl.py ref    # (CPU) run the C reference side
  python scripts/longgate_fusednl.py ours   # (TPU) run fused_nl + diff + log
The 'ref' side caches its record dumps under refbuild/out (re-used if
present).  Appends the per-record drift table to
bench_logs/longgate_r3_fusednl.log.
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

import numpy as np

from tests.test_parity_reference import run_reference_3d, ref_records

OUTDIR = os.path.join(ROOT, "refbuild", "out")
LOG = os.path.join(ROOT, "bench_logs", "longgate_r3_fusednl.log")


def have_ref() -> bool:
    return os.path.exists(os.path.join(OUTDIR, "bpl_res.nc.u.f64"))


def run_ref():
    if have_ref():
        print("reference records already present")
        return
    run_reference_3d("box_pipe_2D_data.txt", "bpl", "box_pipe_3d_long.txt",
                     timeout=7200)
    print("reference done")


def run_ours():
    assert have_ref(), "run the 'ref' side first"
    from cmcfs_tpu.cli3d import run_case
    from cmcfs_tpu.io.netcdf3 import NetCDF3Reader
    import jax
    base = os.path.join(ROOT, "out", "bpl_fusednl")
    os.makedirs(os.path.dirname(base), exist_ok=True)
    for f in (base + "_res.nc",):
        if os.path.exists(f):
            os.remove(f)
    run_case(os.path.join(ROOT, "refbuild", "data", "box_pipe_2D_data.txt"),
             base,
             os.path.join(ROOT, "refbuild", "cases", "box_pipe_3d_long.txt"),
             backend="fused_nl", quiet=True)
    r = NetCDF3Reader(base + "_res.nc")
    lines = [f"backend=fused_nl device={jax.devices()[0]} case=box_pipe_3d_long"]
    worst = 0.0
    for var in "uvwT":
        ref = ref_records(OUTDIR, "bpl", var, (54, 54, 52))
        ours = r.read(var)
        assert len(ours) >= len(ref) >= 10, (len(ours), len(ref))
        for rec in range(len(ref)):
            f, o = ref[rec], ours[rec]
            real = f < 9e4
            assert (real == (o < 9e4)).all(), (var, rec, "mask")
            scale = max(np.abs(f[real]).max(), 1e-30)
            rel = np.abs(o - f)[real].max() / scale
            worst = max(worst, rel)
            lines.append(f"{var} rec {rec} (step {(rec + 1) * 100}): "
                         f"rel drift {rel:.3e}")
    lines.append(f"worst relative drift over 1000 steps: {worst:.3e} "
                 f"(gate 1e-5: {'PASS' if worst < 1e-5 else 'FAIL'})")
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    {"ref": run_ref, "ours": run_ours}[sys.argv[1]]()
