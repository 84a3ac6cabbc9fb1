"""In-step A/B: fused_nl with Y/Z on sweep_axis=1 (pre-xmode) vs routed
through sweep_axis=0 on transposed operands (adi3d.NL_XMODE).

probe_yasx.py showed the isolated kernel costs the same either way, but
in-step the operand transposes fuse into the stacking copies that happen
anyway, while the per-direction profiler shows Y/Z direction-pairs cost
~2x the X pair (RESULTS.md round-3 event table) — so the in-step routing
is the decisive experiment.

Run on the TPU:  python scripts/probe_nl_xmode.py [--steps 10] [--reps 2]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from scripts._nl_ab import run_flag_ab

if __name__ == "__main__":
    run_flag_ab("NL_XMODE", [("sweep1", False), ("xmode", True)],
                __doc__.splitlines()[0])
