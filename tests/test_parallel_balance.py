import numpy as np

from cmcfs_tpu.parallel import balance
from cmcfs_tpu.geom.synthetic import lid_cavity_3d


def test_split_policies():
    g = lid_cavity_3d(32, 16, 16)
    for policy in ("EVEN_X", "EVEN_VOLUME", "EVEN_SEGMENTS"):
        rep = balance.analyze(g.types, 4, policy)
        assert sum(rep.counts) == 32
        # the greedy scan mirrors the reference (Grid3D.cpp:214-229); like the
        # reference's, it is balanced but not necessarily optimal
        assert rep.balanced_imbalance >= 1.0
        assert rep.balanced_imbalance < 1.5


def test_even_volume_counts_reflect_fluid():
    g = lid_cavity_3d(32, 16, 16)
    load = balance.load_per_plane(g.types, "EVEN_VOLUME")
    # border planes hold no fluid
    assert load[0] == 0 and load[-1] == 0
    assert load[16] == (16 - 4) * (16 - 4)


def test_dump_load(tmp_path):
    g = lid_cavity_3d(16, 8, 8)
    p = str(tmp_path / "segs_per_X.txt")
    balance.dump_load(g.types, p)
    lines = open(p).read().splitlines()
    assert len(lines) == 16
