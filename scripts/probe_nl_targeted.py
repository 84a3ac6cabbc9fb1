"""In-step A/B: the stacked-carry step (adi3d.NL_STACKED) vs the
targeted-layout-writes variant (adi3d.NL_TARGETED — each direction's
final pair kernel writes out/tn DIRECTLY in the consuming direction's
kernel layout via in-VMEM slab transposes + permuted-slice DMAs, dual
writes for dual-consumer outputs), killing the 7 XLA relayouts per
global iteration.  The kernels see bit-identical per-cell operands, so
the checksum must match bitwise; the delta is (relayout traffic saved)
minus (in-kernel transpose cost + the extra dual-write stream) — bounded
by Mosaic's lane-transpose throughput (NOTES_NEXT.md item 0b).

Run on the TPU:  python scripts/probe_nl_targeted.py [--steps 10] [--reps 2]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from scripts._nl_ab import run_flag_ab

if __name__ == "__main__":
    run_flag_ab("NL_TARGETED", [("stacked", False), ("targeted", True)],
                __doc__.splitlines()[0])
