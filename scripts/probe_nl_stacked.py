"""In-step A/B: fused_nl per-direction calls (canonical-layout round-trip
per call) vs the stacked-carry step (adi3d.NL_STACKED — 4-var field stacks
carried in each direction's kernel layout, one transpose per operand per
direction transition, no State3D unstack/restack between directions).

The kernels see bit-identical operands either way, so the checksum must
match bitwise; the difference is purely the XLA relayout structure
between the 12 pair-kernel invocations (scripts/probe_glue.py bounds that
budget; CPU-optimized HLO shows identical transpose counts, so any delta
is TPU layout-assignment copies).

Run on the TPU:  python scripts/probe_nl_stacked.py [--steps 10] [--reps 2]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from scripts._nl_ab import run_flag_ab

if __name__ == "__main__":
    run_flag_ab("NL_STACKED", [("perdir", False), ("stacked", True)],
                __doc__.splitlines()[0])
