"""Generate a synthetic extruded-box benchmark case (data + config) that both
this framework and the C reference binary can run — the shared case for the
vs_baseline measurement."""
from __future__ import annotations

import argparse
import os


def gen(outdir: str, dx: float = 0.00409, time_steps: int = 4,
        num_global: int = 4, num_local: int = 2, side_mm: float = 1000.0,
        valve: bool = True, depth: float = 1.04):
    # defaults land the grid at exactly 256x256x256 (BASELINE.md's stated
    # 3D config) — also tile-aligned, so no padded compute is wasted
    os.makedirs(outdir, exist_ok=True)
    data = os.path.join(outdir, "box_data.txt")
    cfg = os.path.join(outdir, "box_config.txt")
    # one frame, one passive square shell + one moving valve segment
    with open(data, "w") as f:
        f.write("1\n1.0\n")
        f.write("2\n" if valve else "1\n")
        f.write("5\n")
        s = side_mm
        for x, y in ((0, 0), (s, 0), (s, s), (0, s), (0, 0)):
            f.write(f"{x:.1f} {y:.1f}\n")
        f.write("Passive\n")
        if valve:
            # stirrer line strictly inside the box (a wall segment would be
            # overwritten by the passive shell raster pass)
            f.write("2\n")
            f.write(f"{0.3*s:.1f} {0.8*s:.1f}\n{0.7*s:.1f} {0.8*s:.1f}\n")
            f.write("Motion\n100.0 0.0\n")
    with open(cfg, "w") as f:
        f.write(f"""dimension\t3D
in_fmt\t\tShape2D
depth\t\t{depth}
Re\t\t200.0
Pr\t\t0.72
lambda\t\t1.4
bc_type\t\tNoSlip
grid_dx\t\t{dx}
grid_dy\t\t{dx}
grid_dz\t\t{dx}
cycles \t\t1
time_steps\t{time_steps}
out_fmt\t\tNetCDF
out_time_steps \t1000000
out_gridx\t32
out_gridy \t32
out_gridz\t32
out_vars\t4 u v w T
solver\t\tADI
num_global \t{num_global}
num_local \t{num_local}
""")
    return data, cfg


def gen_2d(outdir: str, dx: float = 0.001, time_steps: int = 4,
           num_global: int = 2, num_local: int = 1, side_mm: float = 1000.0):
    """2D box case ~(side/dx)^2 runnable by both implementations."""
    import os
    os.makedirs(outdir, exist_ok=True)
    data = os.path.join(outdir, "box2d_data.txt")
    cfg = os.path.join(outdir, "box2d_config.txt")
    with open(data, "w") as f:
        f.write("1\n1.0\n2\n5\n")
        s = side_mm
        for x, y in ((0, 0), (s, 0), (s, s), (0, s), (0, 0)):
            f.write(f"{x:.1f} {y:.1f}\n")
        f.write("Passive\n2\n")
        f.write(f"{0.3*s:.1f} {0.8*s:.1f}\n{0.7*s:.1f} {0.8*s:.1f}\n")
        f.write("Motion\n100.0 0.0\n")
    with open(cfg, "w") as f:
        f.write(f"""dimension\t2D
viscosity \t0.05
density \t1000.0
bc_type\t\tNoSlip
grid_dx\t\t{dx}
grid_dy\t\t{dx}
cycles \t\t1
time_steps\t{time_steps}
out_time_steps \t1000000
out_gridx\t50
out_gridy \t50
out_fmt\t\tNetCDF
solver\t\tADI
num_global \t{num_global}
num_local \t{num_local}
""")
    return data, cfg


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--dx", type=float, default=0.0041)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()
    print(gen(args.outdir, dx=args.dx, time_steps=args.steps))
