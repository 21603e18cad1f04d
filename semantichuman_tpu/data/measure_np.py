"""NumPy body-measurement helpers for offline preprocessing
(reference: obj2npy.py:61-79, utils_SH.py:86-161)."""

from __future__ import annotations

import numpy as np


def girths_np(verts: np.ndarray, factor_list, edge_point_index_list) -> np.ndarray:
    """Per measured part: girth = perimeter of the closed polyline through
    edge-interpolated points  p_k = v[e_k0]*(1-f_k) + v[e_k1]*f_k."""
    out = np.empty(len(factor_list))
    for i in range(len(factor_list)):
        e = np.asarray(edge_point_index_list[i], dtype=np.int64)
        f = np.asarray(factor_list[i], dtype=np.float64).reshape(len(e), -1)
        pts = verts[e[:, 0]] * (1.0 - f) + verts[e[:, 1]] * f
        seg = np.linalg.norm(np.diff(pts, axis=0), axis=1).sum()
        seg += np.linalg.norm(pts[0] - pts[-1])
        out[i] = seg
    return out


def bone_lengths_np(kps: np.ndarray, skl_list) -> np.ndarray:
    """Per bone: |kps[a] - far|, far = kps[b] or midpoint(kps[b1], kps[b2])."""
    out = np.empty(len(skl_list))
    for k, bone in enumerate(skl_list):
        a = kps[bone[0]]
        b = kps[bone[1]] if len(bone) == 2 else 0.5 * (kps[bone[1]] + kps[bone[2]])
        out[k] = np.linalg.norm(a - b)
    return out
