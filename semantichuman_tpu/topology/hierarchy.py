"""Multi-level QEM mesh hierarchy (reference: mesh_sampling.py:229-287).

Chains QSLIM decimation over ds_factors, collecting per level:
  * vertices / faces,
  * the downsample row-selection (as a gather index vector),
  * the barycentric upsample gather (indices + weights).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .deformation import upsample_transform
from .qem import qslim_decimate


@dataclass
class HierarchyLevels:
    verts: list      # [L+1] arrays [V_l, 3]
    faces: list      # [L+1] arrays [F_l, 3] int32
    pool_idx: list   # [L] arrays [V_{l+1}] int64 — coarse vertex -> fine index
    unpool_idx: list  # [L] arrays [V_l, 3] int32 — fine vertex -> 3 coarse ids
    unpool_w: list   # [L] arrays [V_l, 3] float32 barycentric weights

    @property
    def sizes(self) -> list[int]:
        return [len(v) for v in self.verts]


def build_hierarchy(verts: np.ndarray, faces: np.ndarray,
                    ds_factors) -> HierarchyLevels:
    lv = [np.asarray(verts, dtype=np.float64)]
    lf = [np.asarray(faces, dtype=np.int32)]
    pool_idx, unpool_idx, unpool_w = [], [], []
    for factor in ds_factors:
        new_faces, keep_idx, _D = qslim_decimate(lv[-1], lf[-1],
                                                 factor=1.0 / factor)
        coarse_verts = lv[-1][keep_idx]
        _U, up_idx, up_w = upsample_transform(coarse_verts, new_faces, lv[-1])
        lv.append(coarse_verts)
        lf.append(new_faces)
        pool_idx.append(keep_idx)
        unpool_idx.append(up_idx)
        unpool_w.append(up_w)
    return HierarchyLevels(lv, lf, pool_idx, unpool_idx, unpool_w)


def build_hierarchy_from_meshes(verts: np.ndarray, faces: np.ndarray,
                                level_meshes) -> HierarchyLevels:
    """Alternate path when pre-decimated meshes are supplied (reference:
    mesh_sampling.py:267-287): D selects each coarse vertex's nearest fine
    vertex; U is the usual barycentric transfer."""
    from scipy.spatial import cKDTree

    lv = [np.asarray(verts, dtype=np.float64)]
    lf = [np.asarray(faces, dtype=np.int32)]
    pool_idx, unpool_idx, unpool_w = [], [], []
    for cv, cf in level_meshes:
        cv = np.asarray(cv, dtype=np.float64)
        cf = np.asarray(cf, dtype=np.int32)
        kd = cKDTree(lv[-1])
        _, nearest = kd.query(cv)
        _U, up_idx, up_w = upsample_transform(cv, cf, lv[-1])
        lv.append(cv)
        lf.append(cf)
        pool_idx.append(nearest.astype(np.int64))
        unpool_idx.append(up_idx)
        unpool_w.append(up_w)
    return HierarchyLevels(lv, lf, pool_idx, unpool_idx, unpool_w)
