"""Measure the C reference's CPU throughput on the shared benchmark case and
record BASELINE_MEASURED.json (consumed by bench.py's vs_baseline).

Runs the -O2 reference binary twice (n1 and n2 physical steps) and uses the
wall-time slope to exclude setup cost.  The reference repo publishes no
numbers (SURVEY.md §6), so this measured baseline is the comparison point.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "refbuild", "FluidSolver3D")
BIN2D = os.path.join(ROOT, "refbuild", "FluidSolver2D")

sys.path.insert(0, ROOT)
from scripts.gen_box_case import gen, gen_2d  # noqa: E402


def run(case_dir: str, time_steps: int) -> tuple[float, tuple[int, int, int]]:
    data, cfg = gen(case_dir, dx=float(os.environ.get("BENCH_DX", "0.00409")),
                    time_steps=time_steps)
    t0 = time.time()
    r = subprocess.run([BIN, "box_data.txt", "bx", "box_config.txt"],
                       cwd=case_dir, capture_output=True, text=True,
                       timeout=7200)
    wall = time.time() - t0
    m = re.search(r"Grid = (\d+) x (\d+) x (\d+)", r.stdout)
    dims = tuple(int(x) for x in m.groups()) if m else (0, 0, 0)
    return wall, dims


def run_2d(case_dir: str, time_steps: int) -> tuple[float, tuple[int, int]]:
    data, cfg = gen_2d(case_dir, dx=0.001024, time_steps=time_steps)
    t0 = time.time()
    r = subprocess.run([BIN2D, "box2d_data.txt", "bx2d.nc", "box2d_config.txt"],
                       cwd=case_dir, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    m = re.search(r"[\d.]+,[\d.]+,(\d+),(\d+),", r.stdout)
    dims = tuple(int(x) for x in m.groups()) if m else (0, 0)
    return wall, dims


def main():
    case_dir = os.path.join(ROOT, "out", "refbench")
    n1, n2 = 2, 6          # -> 1 and 5 physical steps (loop runs N-1 steps)
    w1, dims = run(case_dir, n1)
    w2, _ = run(case_dir, n2)
    steps = (n2 - 1) - (n1 - 1)
    per_step = (w2 - w1) / steps
    cells = dims[0] * dims[1] * dims[2]
    out = {
        "dims": dims,
        "cells": cells,
        "ms_per_step_ref_cpu": per_step * 1e3,
        "cell_updates_per_sec_ref_cpu": cells / per_step,
        "setup_sec_ref_cpu": max(w1 - per_step, 0.0),
        "binary": "refbuild/FluidSolver3D (-O2 -fopenmp, CPU backend)",
        "case": "extruded box ~256^3, ADI, num_global=4, num_local=2",
        "host_nproc": os.cpu_count(),
    }
    # 2D 1024^2 baseline
    case2 = os.path.join(ROOT, "out", "refbench2d")
    w1, dims2 = run_2d(case2, 3)         # 2 physical steps
    w2, _ = run_2d(case2, 11)            # 10 physical steps
    per2 = (w2 - w1) / 8
    cells2 = dims2[0] * dims2[1]
    out.update({
        "dims_2d": dims2,
        "ms_per_step_ref_cpu_2d": per2 * 1e3,
        "cell_updates_per_sec_ref_cpu_2d": cells2 / per2,
    })
    with open(os.path.join(ROOT, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
