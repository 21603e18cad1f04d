"""Topology compiler: template mesh -> frozen device tables.

Replaces the reference's scattered precompute in main.py:93-205 /
utils_SH.py:264-345 with one cached artifact.  Every array here is static at
trace time; the jitted model closes over them.

Dummy-vertex convention (identical to the reference): device tensors carry
V+1 rows per level, the last row being a zero "dummy" vertex.  Spiral pads
and out-of-part gathers address the dummy row, and every conv masks it back
to zero (reference: models.py:49-51, utils_spiral.py:85-94, main.py:183-193).
At compile time we resolve the reference's `-1` pad indices to the explicit
dummy row index V_l, so device code never needs negative-index semantics.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .adjacency import adjacency_lists, triangle_lists
from .hierarchy import HierarchyLevels, build_hierarchy
from .spiral import generate_spirals


@dataclass
class MeshHierarchy:
    """Everything the device model needs about one mesh topology."""
    # per level (L+1 levels)
    verts: list            # [V_l, 3] float64 template geometry
    faces: list            # [F_l, 3] int32
    sizes: list            # V_l
    spirals: list          # [V_l + 1, S_l] int32, pads resolved to V_l (dummy)
    spiral_sizes: list     # S_l
    reference_points: list  # list[list[int]] spiral anchor per level
    # per transition (L entries)
    pool_idx: list         # [V_{l+1} + 1] int32 (last entry = fine dummy V_l)
    unpool_idx: list       # [V_l + 1, 3] int32 (dummy row -> coarse dummy)
    unpool_w: list         # [V_l + 1, 3] float32
    # composed: original fine index of each coarsest-level vertex
    coarse_to_fine: np.ndarray = field(default=None)

    @property
    def n_levels(self) -> int:
        return len(self.verts)

    def downsample_part_indices(self, part_dict: dict) -> dict:
        """Remap a {part: fine-vertex indices} dict onto the coarsest level
        (reference: main.py:118-126).  Coarse indices are ascending per part."""
        out = {}
        for name, fine_idx in part_dict.items():
            mask = np.isin(self.coarse_to_fine, np.asarray(fine_idx))
            out[name] = np.nonzero(mask)[0].astype(np.int32)
        return out

    # --- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        data = {"n_levels": np.array(self.n_levels)}
        for l in range(self.n_levels):
            data[f"verts_{l}"] = self.verts[l]
            data[f"faces_{l}"] = self.faces[l]
            data[f"spirals_{l}"] = self.spirals[l]
            data[f"refpts_{l}"] = np.asarray(self.reference_points[l])
        for l in range(self.n_levels - 1):
            data[f"pool_idx_{l}"] = self.pool_idx[l]
            data[f"unpool_idx_{l}"] = self.unpool_idx[l]
            data[f"unpool_w_{l}"] = self.unpool_w[l]
        data["coarse_to_fine"] = self.coarse_to_fine
        np.savez_compressed(path, **data)

    @staticmethod
    def load(path: str) -> "MeshHierarchy":
        z = np.load(path, allow_pickle=False)
        n = int(z["n_levels"])
        verts = [z[f"verts_{l}"] for l in range(n)]
        faces = [z[f"faces_{l}"] for l in range(n)]
        spirals = [z[f"spirals_{l}"] for l in range(n)]
        refpts = [z[f"refpts_{l}"].tolist() for l in range(n)]
        pool_idx = [z[f"pool_idx_{l}"] for l in range(n - 1)]
        unpool_idx = [z[f"unpool_idx_{l}"] for l in range(n - 1)]
        unpool_w = [z[f"unpool_w_{l}"] for l in range(n - 1)]
        return MeshHierarchy(
            verts=verts, faces=faces, sizes=[len(v) for v in verts],
            spirals=spirals, spiral_sizes=[s.shape[1] for s in spirals],
            reference_points=refpts, pool_idx=pool_idx,
            unpool_idx=unpool_idx, unpool_w=unpool_w,
            coarse_to_fine=z["coarse_to_fine"])


def compile_topology(verts: np.ndarray, faces: np.ndarray,
                     ds_factors=(2, 2, 2, 2),
                     step_sizes=(2, 2, 1, 1, 1),
                     dilation=(2, 2, 1, 1, 1),
                     reference_vertex: int = 414,
                     cache_path: str | None = None,
                     level_meshes=None) -> MeshHierarchy:
    """Compile a template mesh into a MeshHierarchy (cached as .npz).

    The cache is keyed on every compile parameter via a sidecar meta file:
    template geometry fingerprint, factors/steps/dilation/anchor, and the
    level_meshes signature.  A cache whose meta mismatches — or that has no
    sidecar at all (pre-meta workdirs) — is recompiled, never trusted."""
    import hashlib

    geom = hashlib.sha1(
        np.ascontiguousarray(np.asarray(verts, np.float64)).tobytes()
        + np.ascontiguousarray(np.asarray(faces, np.int64)).tobytes()
    ).hexdigest()[:16]
    lm_sig = (None if level_meshes is None else
              tuple((len(v), len(f)) for v, f in level_meshes))
    meta = repr((geom, tuple(ds_factors), tuple(step_sizes), tuple(dilation),
                 int(reference_vertex), lm_sig))
    if cache_path and os.path.exists(cache_path):
        meta_path = cache_path + ".meta"
        saved = (open(meta_path).read() if os.path.exists(meta_path)
                 else None)
        if saved == meta:
            return MeshHierarchy.load(cache_path)
        # stale or unverifiable cache — fall through and recompile

    if level_meshes is None:
        levels = build_hierarchy(verts, faces, ds_factors)
    else:
        from .hierarchy import build_hierarchy_from_meshes
        levels = build_hierarchy_from_meshes(verts, faces, level_meshes)

    hier = _finalize(levels, step_sizes, dilation, reference_vertex)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        hier.save(cache_path)
        with open(cache_path + ".meta", "w") as f:
            f.write(meta)
    return hier


def _finalize(levels: HierarchyLevels, step_sizes, dilation,
              reference_vertex: int) -> MeshHierarchy:
    n_levels = len(levels.verts)

    # spiral anchor per level: the reference vertex, then its nearest coarse
    # vertex per level (reference: main.py:161-167)
    ref_points = [[reference_vertex]]
    anchor = levels.verts[0][reference_vertex]
    for l in range(1, n_levels):
        d = np.sum((levels.verts[l] - anchor[None]) ** 2, axis=1)
        ref_points.append([int(np.argmin(d))])

    adj = [adjacency_lists(len(levels.verts[l]), levels.faces[l])
           for l in range(n_levels)]
    trigs = [triangle_lists(len(levels.verts[l]), levels.faces[l])
             for l in range(n_levels)]
    tables, spiral_sizes, _ = generate_spirals(
        list(step_sizes), levels.verts, adj, trigs, ref_points,
        dilation=list(dilation))

    # resolve -1 pads to the explicit dummy row index per level
    spirals = []
    for l, t in enumerate(tables):
        dummy = levels.sizes[l]
        spirals.append(np.where(t < 0, dummy, t).astype(np.int32))

    # pool/unpool with dummy rows appended
    pool_idx, unpool_idx, unpool_w = [], [], []
    for l in range(n_levels - 1):
        fine_dummy = levels.sizes[l]
        coarse_dummy = levels.sizes[l + 1]
        pool_idx.append(np.concatenate(
            [levels.pool_idx[l], [fine_dummy]]).astype(np.int32))
        ui = np.concatenate(
            [levels.unpool_idx[l],
             [[coarse_dummy, coarse_dummy, coarse_dummy]]]).astype(np.int32)
        uw = np.concatenate(
            [levels.unpool_w[l], [[1.0, 0.0, 0.0]]]).astype(np.float32)
        unpool_idx.append(ui)
        unpool_w.append(uw)

    # original fine index of each coarsest vertex (composed D — main.py:118-123)
    c2f = np.asarray(levels.pool_idx[-1])
    for l in range(n_levels - 3, -1, -1):
        c2f = np.asarray(levels.pool_idx[l])[c2f]

    return MeshHierarchy(
        verts=levels.verts, faces=levels.faces, sizes=levels.sizes,
        spirals=spirals, spiral_sizes=spiral_sizes,
        reference_points=ref_points, pool_idx=pool_idx,
        unpool_idx=unpool_idx, unpool_w=unpool_w,
        coarse_to_fine=c2f.astype(np.int64))
