"""cli3d ``carried`` flag: whole-driver equivalence vs the default loop.

Gated (CMCFS_LONG=1): two full interpreter-mode cli runs of the fused_nl
targeted step.  The unit-level equivalence (fields bitwise, metric to
reduction-order tolerance) is pinned in the default tier by
tests/test_carried.py::test_carried_matches_cli_sequence_bitwise; this
exercises the DRIVER wiring — event-point materialization, NetCDF
records, the final returned state.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CMCFS_LONG") != "1",
    reason="CMCFS_LONG=1 gated (two interpreter-mode cli runs)")


def test_cli3d_carried_output_byte_identical(tmp_path):
    from cmcfs_tpu.cli3d import run_case
    from scripts.gen_box_case import gen

    # dx=0.0164 -> 65^3 is the SMALLEST rasterized box where the carried
    # dispatch engages: below it the shell raster leaves interior rows
    # that are not NODE_IN on X/Y (merge_ok False), and nl_carried_pre
    # correctly refuses.  ~2 interpreter-mode cli steps per arm.
    data, cfg = gen(str(tmp_path / "case"), dx=0.0164, time_steps=4,
                    num_global=2, num_local=2)
    # output every step so a record lands mid-run (i=0 and i=1),
    # covering the carried loop's event-point materialization
    with open(cfg) as f:
        txt = f.read()
    with open(cfg, "w") as f:
        f.write(txt.replace("out_time_steps \t1000000",
                            "out_time_steps \t1"))

    s1, _ = run_case(data, str(tmp_path / "dflt"), cfg, backend="fused_nl",
                     quiet=True, max_steps=2)
    s2, _ = run_case(data, str(tmp_path / "carr"), cfg, backend="fused_nl",
                     quiet=True, max_steps=2, carried=True)
    # the engagement predicate run_case used (static — same answer here)
    assert s2.carried_runner(2) is not None, \
        "carried did not engage: this test compared identical programs"

    with open(tmp_path / "dflt_res.nc", "rb") as a, \
         open(tmp_path / "carr_res.nc", "rb") as b:
        assert a.read() == b.read()
    for f1, f2 in zip(s1.cur, s2.cur):
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    for f1, f2 in zip(s1.next, s2.next):
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
