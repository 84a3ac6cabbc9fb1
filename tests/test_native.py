"""Native geometry engine vs the NumPy reference implementations."""
import numpy as np
import pytest

from cmcfs_tpu.geom import native
from cmcfs_tpu.core.types import NodeType

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native lib not built")


def _numpy_only(monkeypatch):
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)


@needs_native
def test_line_class_3d_native_matches_numpy(monkeypatch):
    from cmcfs_tpu.ops import masks
    rng = np.random.default_rng(0)
    t = rng.choice([0, 1, 2, 3], size=(12, 10, 14), p=[0.5, 0.3, 0.15, 0.05]).astype(np.int8)
    for ax in range(3):
        nat = masks.line_class_3d(t, ax)
        _numpy_only(monkeypatch)
        ref = masks.line_class_3d(t, ax)
        monkeypatch.undo()
        np.testing.assert_array_equal(nat.cls_a, ref.cls_a)
        assert (nat.cls_b is None) == (ref.cls_b is None)
        if ref.cls_b is not None:
            np.testing.assert_array_equal(nat.cls_b, ref.cls_b)
            np.testing.assert_array_equal(nat.take_b, ref.take_b)


@needs_native
def test_line_class_2d_native_matches_numpy(monkeypatch):
    from cmcfs_tpu.ops import masks
    rng = np.random.default_rng(1)
    t = rng.choice([0, 1, 2, 3], size=(40, 33), p=[0.5, 0.3, 0.15, 0.05]).astype(np.int8)
    for ax in range(2):
        nat = masks.line_class_2d(t, ax)
        _numpy_only(monkeypatch)
        ref = masks.line_class_2d(t, ax)
        monkeypatch.undo()
        np.testing.assert_array_equal(nat, ref)


@needs_native
def test_grid2d_build_native_matches_numpy(monkeypatch):
    from cmcfs_tpu.core.scene2d import Scene2D
    from cmcfs_tpu.geom.raster2d import Grid2D

    sc = Scene2D.load("/root/reference/data/2D/box_pipe/box_pipe_data.txt",
                      dx=0.0007, dy=0.0007)

    g_nat = Grid2D(sc, 1.0, True, 0.5)
    g_nat.prepare_frame(0, 0.3)

    _numpy_only(monkeypatch)
    g_np = Grid2D(sc, 1.0, True, 0.5)
    g_np.prepare_frame(0, 0.3)
    monkeypatch.undo()

    np.testing.assert_array_equal(g_nat.cur_types, g_np.cur_types)
    np.testing.assert_array_equal(g_nat.cur_vel, g_np.cur_vel)
    np.testing.assert_array_equal(g_nat.cur_T, g_np.cur_T)


@needs_native
def test_flood_fill_3d_native_matches_scipy(monkeypatch):
    from cmcfs_tpu.geom.grid3d import flood_fill_outside_3d
    rng = np.random.default_rng(2)
    t = rng.choice([0, 2], size=(16, 14, 12), p=[0.8, 0.2]).astype(np.int8)
    t[0, 0, 0] = NodeType.IN
    t1 = t.copy()
    flood_fill_outside_3d(t1)
    t2 = t.copy()
    _numpy_only(monkeypatch)
    flood_fill_outside_3d(t2)
    monkeypatch.undo()
    np.testing.assert_array_equal(t1, t2)
