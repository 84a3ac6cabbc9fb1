"""Scene3D loading / timing / interpolation (reference Grid3D.cpp:373-435,
900-964)."""
import numpy as np
import pytest

from cmcfs_tpu.core.scene3d import Scene3D

DATA = "/root/reference/data/3D/example_tests/tetra/tetra_data.txt"


def test_tetra_scene():
    sc = Scene3D.load(DATA, 0.01, 0.01, 0.01)
    assert sc.num_frames() == 1
    sh = sc.frames[0].shapes[0]
    assert sh.vertices.shape == (4, 3)
    assert sh.indices.shape == (4, 3)
    assert sc.frames[0].duration == pytest.approx(1.0 / 75)   # Grid3D.cpp:415
    # vertices converted to grid coords: inside [0, dims)
    assert sh.vertices.min() >= 0
    assert sh.vertices[:, 0].max() <= sc.dimx
    assert (sc.dimx, sc.dimy, sc.dimz) == (105, 53, 53)


def test_subframe_blend():
    sc = Scene3D.load(DATA, 0.01, 0.01, 0.01)
    fr = sc.compute_subframe(0, 0.25)
    np.testing.assert_allclose(fr.shapes[0].vertices,
                               sc.frames[0].shapes[0].vertices, atol=1e-6)
    f, s = sc.frame_substep(0.5 / 75)
    assert f == 0 and s == pytest.approx(0.5)
