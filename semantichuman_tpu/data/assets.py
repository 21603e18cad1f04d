"""Body-asset bundle: template mesh + joint regressor + part partition +
girth-measurement tables (the reference's asset/ directory contract,
SURVEY.md §2.4), loadable from disk or generated synthetically."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..topology.obj_io import load_obj


@dataclass
class BodyAssets:
    template_verts: np.ndarray          # [V, 3]
    template_faces: np.ndarray          # [F, 3]
    j_regressor: np.ndarray             # [35, V]
    part_dict: dict                     # name -> fine vertex indices (17)
    girth_edges: list = field(default_factory=list)     # per measured part
    girth_factors: list = field(default_factory=list)
    edge_verts: np.ndarray | None = None                # [E, 2] mesh edges

    @staticmethod
    def load(asset_dir: str, template_path: str) -> "BodyAssets":
        """Load the reference asset layout: J_regressor.npy,
        vert_part_index_dict.npy, factor_list.npy, edge_point_index_list.npy,
        edge_verts_index.npy (reference: configure/cfgs.py:55-59)."""
        tv, tf = load_obj(template_path)
        j = np.load(os.path.join(asset_dir, "J_regressor.npy"),
                    allow_pickle=True)
        pd = np.load(os.path.join(asset_dir, "vert_part_index_dict.npy"),
                     allow_pickle=True).item()
        def opt(name):
            p = os.path.join(asset_dir, name)
            return np.load(p, allow_pickle=True) if os.path.exists(p) else None
        factors = opt("factor_list.npy")
        edges = opt("edge_point_index_list.npy")
        ev = opt("edge_verts_index.npy")
        return BodyAssets(
            template_verts=tv, template_faces=tf, j_regressor=np.asarray(j),
            part_dict={k: np.asarray(v) for k, v in pd.items()},
            girth_edges=list(edges) if edges is not None else [],
            girth_factors=list(factors) if factors is not None else [],
            edge_verts=ev)

    @staticmethod
    def synthetic(n_theta: int | None = None,
                  n_phi: int | None = None) -> tuple["BodyAssets", object]:
        """Procedural stand-in assets (returns (assets, SyntheticHuman))."""
        from .synthetic import SyntheticHuman
        from ..topology.adjacency import unique_edges
        sh = SyntheticHuman(n_theta=n_theta, n_phi=n_phi)
        assets = BodyAssets(
            template_verts=sh.template_verts,
            template_faces=sh.template_faces,
            j_regressor=sh.J_regressor,
            part_dict=sh.part_dict,
            girth_edges=sh.girth_edges,
            girth_factors=sh.girth_factors,
            edge_verts=unique_edges(sh.template_faces))
        return assets, sh


def part_color_map(part_dict: dict, n_verts: int) -> "np.ndarray":
    """[V, 3] uint8-ish per-vertex part color map (reference main.py:132-158);
    vertices outside every part stay neutral grey."""
    from ..constants import PARTCOLOR_LIST
    colors = np.full((n_verts, 3), 192, dtype=np.int32)
    for k, idx in enumerate(part_dict.values()):
        colors[np.asarray(idx)] = PARTCOLOR_LIST[k % len(PARTCOLOR_LIST)]
    return colors
