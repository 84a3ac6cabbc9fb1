"""NetCDF3 writer/reader round-trip, profiler, project files."""
import numpy as np

from cmcfs_tpu.io.netcdf3 import NetCDF3Writer, NetCDF3Reader, NC_FLOAT, NC_DOUBLE, NC_CHAR


def test_netcdf3_roundtrip(tmp_path):
    p = str(tmp_path / "t.nc")
    w = NetCDF3Writer(p, {"x": 4, "y": 3, "t": None},
                      gattrs={"title": (NC_CHAR, "hello")})
    w.def_var("x", NC_FLOAT, ["x"], {"units": (NC_CHAR, "m")})
    w.def_var("u", NC_DOUBLE, ["t", "x", "y"])
    w.create()
    w.put_var("x", [1.0, 2.0, 3.0, 4.0])
    r0 = np.arange(12, dtype=np.float64).reshape(4, 3)
    w.put_record("u", 0, r0)
    w.put_record("u", 2, r0 * 2)

    r = NetCDF3Reader(p)
    assert r.numrecs == 3
    assert ("x", 4) in r.dims and ("t", 0) in r.dims
    assert "hello" in str(r.gattrs["title"])
    np.testing.assert_allclose(r.read("x"), [1, 2, 3, 4])
    u = r.read("u")
    np.testing.assert_allclose(u[0], r0)
    np.testing.assert_allclose(u[1], 0.0)          # unwritten record is dense zero
    np.testing.assert_allclose(u[2], r0 * 2)
    assert "m" in str(r.vars["x"]["attrs"]["units"])


def test_profiler_report():
    import time
    from cmcfs_tpu.utils.profiler import Profiler
    prof = Profiler(sync=False)
    for _ in range(3):
        with prof.section("stepA"):
            time.sleep(0.001)
    with prof.section("stepB"):
        time.sleep(0.002)
    rep = prof.report()
    assert "stepA" in rep and "stepB" in rep and "overall" in rep
    csv = prof.report(csv=True)
    assert csv.splitlines()[0] == "event,count,total_ms,avg_ms"
    assert any(line.startswith("stepA,3,") for line in csv.splitlines())


def test_project_file(tmp_path):
    from cmcfs_tpu.io.project import load_project
    d = tmp_path / "in.txt"; d.write_text("x")
    c = tmp_path / "cfg.txt"; c.write_text("x")
    p3 = tmp_path / "p3.txt"
    p3.write_text(f"{d}\nout.nc\n{c}\n")
    inp, field, out, cfg = load_project(str(p3))
    assert inp == str(d) and field == "" and out == "out.nc" and cfg == str(c)
    f = tmp_path / "field.txt"; f.write_text("x")
    p4 = tmp_path / "p4.txt"
    p4.write_text(f"{d}\n{f}\nout.nc\n{c}\n")
    inp, field, out, cfg = load_project(str(p4))
    assert field == str(f) and out == "out.nc"


def test_bmp_mask(tmp_path):
    from cmcfs_tpu.io.image import mask_to_bmp
    from cmcfs_tpu.core.types import NodeType
    t = np.full((10, 7), NodeType.OUT, dtype=np.int8)
    t[2:8, 2:5] = NodeType.IN
    p = str(tmp_path / "m.bmp")
    mask_to_bmp(t, p)
    blob = open(p, "rb").read()
    assert blob[:2] == b"BM"
    import struct
    size = struct.unpack("<I", blob[2:6])[0]
    assert size == len(blob)
