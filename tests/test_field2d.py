"""Velocity-source field loading, interpolation and rasterization
(reference Field2D, Geometry.h:232-302 + RasterField, Grid2D.cpp:143-154 +
field blending in ComputeSubframe, Grid2D.cpp:425-451).  No shipped case
includes a field file, so this is exercised synthetically."""
import numpy as np

from cmcfs_tpu.core.scene2d import Scene2D
from cmcfs_tpu.core.types import NodeType


def write_case(tmp_path):
    data = tmp_path / "data.txt"
    # a simple static box, 1 frame
    data.write_text("""1
1.0
1
5
0.0 0.0
100.0 0.0
100.0 100.0
0.0 100.0
0.0 0.0
Passive
""")
    field = tmp_path / "field.txt"
    # header: minx miny maxx maxy / dx dy nx ny; one frame block
    lines = ["10.0 10.0 90.0 90.0", "40.0 40.0 3 3", "Frame 0", "skipline"]
    vals = []
    for j in range(3):
        row = []
        for i in range(3):
            row.append(f"{(i+1)*100.0} {(j+1)*200.0}")
        vals.append(" ".join(row))
    lines += vals + ["end"]
    field.write_text("\n".join(lines) + "\n")
    return str(data), str(field)


def test_field_load_and_raster(tmp_path):
    data, field = write_case(tmp_path)
    sc = Scene2D.load(data, field, dx=0.002, dy=0.002)
    fld = sc.frames[0].field
    assert fld.nx == 3 and fld.ny == 3
    assert fld.min_x == 0.01 and abs(fld.dx - 0.04) < 1e-9
    # velocity VALUES are not unit-scaled (reference Grid2D.cpp:356-360)
    np.testing.assert_allclose(fld.data[0, 0], [100.0, 200.0], atol=1e-6)

    from cmcfs_tpu.geom.raster2d import Grid2D
    g = Grid2D(sc, 1.0, True, 0.5)
    g.prepare_frame(0, 0.0)
    # field source cells become BOUND with the sampled velocity
    src = (g.cur_types == NodeType.BOUND) & (np.abs(g.cur_vel[..., 0]) > 0.05)
    assert src.sum() > 0
    # nearest (floor) sampling: a cell inside the first field cell gets (100, 200)
    i = int((0.02 - sc.bbox_min[0]) / 0.002)
    j = int((0.02 - sc.bbox_min[1]) / 0.002)
    np.testing.assert_allclose(g.cur_vel[i, j], [100.0, 200.0], atol=1e-4)


def test_field_subframe_blend(tmp_path):
    data, field = write_case(tmp_path)
    sc = Scene2D.load(data, field, dx=0.002, dy=0.002)
    # duplicate the field into a "next frame" slot by interpolating with itself
    fr = sc.compute_subframe(0, 0.5)
    assert fr.field.nx == 3
    np.testing.assert_allclose(fr.field.data, sc.frames[0].field.data, atol=1e-6)
