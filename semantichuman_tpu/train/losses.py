"""The geometric disentanglement loss stack, fully vectorized.

Every loss here reproduces a reference loss term bit-for-bit in math while
replacing its Python-per-sample/per-part loops and host round-trips with
batched device code inside one jitted step:

  * rec            — mean-L1 reconstruction (train_funcs.py:135)
  * edgereg        — per-face edge-length ratio regularizer; the reference
                     loops the batch and pulls GT to CPU per item
                     (train_funcs.py:137-144) — here a single gather
  * zpartreg       — ties per-part ‖z‖ to the part's physical girth measure
                     (train_funcs.py:145-152)
  * kps loss       — regressed keypoints of an edited decode must match the
                     edited targets (train_funcs.py:229-232,335-342)
  * weighted dist  — orientation-adaptive intra-part distance-matrix
                     preservation (train_funcs.py:243-284,353-389)
  * volume         — per-part signed-volume preservation under skeleton
                     orientation exchange (train_funcs.py:56-71,323-333)

Conventions: `verts` tensors are [B, V+1, 3] with the dummy row last;
"nodummy" slices drop it.  Part structure is static (trace-time index
arrays), so the 17-part loops unroll at trace time with each part's TRUE
size — no padding waste inside the distance matrices.
"""

from __future__ import annotations

from dataclasses import dataclass, field


import numpy as np
import jax.numpy as jnp

from ..constants import (KPS_KEEP, LEAF_PART_INDICES, N_PARTS,
                         NOLEAF_IN_MEASURE, NOLEAF_PART_INDICES, SKL_LIST)
from ..ops.distance import (face_edge_lengths, masked_pairwise_dist,
                            pairwise_dist, signed_part_volumes)
from ..constants import bone_endpoint_arrays
from ..ops.skeleton import bone_vectors


@dataclass(frozen=True)
class LossTables:
    """Static host-precomputed arrays the losses close over."""
    faces: np.ndarray                 # [F, 3] int32
    j_regressor: np.ndarray           # [35, V] f32
    part_indices: tuple               # 17 int arrays (fine level)
    face_part_mask: np.ndarray        # [F, n_noleaf] one-hot
    kps_keep: np.ndarray = field(
        default_factory=lambda: np.asarray(KPS_KEEP, np.int32))


def build_loss_tables(faces: np.ndarray, j_regressor: np.ndarray,
                      part_dict: dict) -> LossTables:
    faces = np.asarray(faces, dtype=np.int32)
    n_verts = j_regressor.shape[1]
    part_of_vertex = np.full(n_verts, -1, dtype=np.int32)
    part_indices = []
    for k, idx in enumerate(part_dict.values()):
        part_of_vertex[np.asarray(idx)] = k
        part_indices.append(np.asarray(idx, dtype=np.int32))
    fp = part_of_vertex[faces]                    # [F, 3]
    uniform = (fp[:, 0] == fp[:, 1]) & (fp[:, 0] == fp[:, 2])
    mask = np.zeros((len(faces), len(NOLEAF_PART_INDICES)), dtype=np.float32)
    for col, p in enumerate(NOLEAF_PART_INDICES):
        mask[:, col] = uniform & (fp[:, 0] == p)
    return LossTables(faces=faces,
                      j_regressor=np.asarray(j_regressor, np.float32),
                      part_indices=tuple(part_indices),
                      face_part_mask=mask)


# --- primitive losses ---------------------------------------------------------

def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def rec_loss(tx, tx_hat):
    return l1(tx, tx_hat)


def edgereg_loss(tx_nodummy, rec_nodummy, faces, gt_edges=None):
    """mean over batch/faces/edges of |rec_edge / (gt_edge + 1e-5) − 1|.

    gt_edges [B, F, 3]: the GT face-edge lengths, optionally PRECOMPUTED —
    they are a pure per-sample function of the training data, so the
    device-resident pipeline stages them once (data.device_data) instead
    of re-gathering 2×F·3 vertex rows per step; elementwise math, so the
    staged values are bitwise what this fallback computes."""
    if gt_edges is None:
        gt_edges = face_edge_lengths(tx_nodummy, faces)
    gt = gt_edges + 1e-5
    pred = face_edge_lengths(rec_nodummy, faces)
    return jnp.mean(jnp.abs(pred / gt - 1.0))


def zpartreg_loss(z, measure, relat: bool = True):
    """z [B, 17, nz], measure [B, 32] (16 girths + 16 lengths).

    Uses the 12 non-leaf parts; measure column layout follows
    MEASURE_PART_LIST (train_funcs.py:108-113,145-152)."""
    z_norm = jnp.sqrt(jnp.sum(z ** 2, axis=2))
    zn = z_norm[:, jnp.asarray(NOLEAF_PART_INDICES)]
    m = measure[:, jnp.asarray(NOLEAF_IN_MEASURE)]
    if relat:
        return l1(zn / m, jnp.ones_like(m))
    return l1(zn, m)


def kps_consistency_loss(rec_nodummy, target_kps_kept, j_regressor, kps_keep):
    """L1 between regressed keypoints of a decode and the edit targets."""
    kps_rec = jnp.einsum("jv,bvd->bjd", j_regressor, rec_nodummy)
    return l1(jnp.take(kps_rec, kps_keep, axis=1), target_kps_kept)


def _distance_weights(ang, part_idx: int, w_mode: str, w_threshold: float,
                      leafkeep: bool):
    """ang [B, n, n] degrees -> weights [B, n, n] with zeroed diagonal."""
    if w_mode == "all_one" or (leafkeep and part_idx in LEAF_PART_INDICES):
        w = jnp.ones_like(ang)
    elif w_mode == "linear":
        w = ang / 90.0
    elif w_mode == "sin":
        w = jnp.sin(ang / 180.0 * jnp.pi)
    elif w_mode == "threshold":
        w = ang / 90.0
        w = jnp.where(w < w_threshold, 0.0, w)
    else:
        raise ValueError(f"unknown w_mode {w_mode!r}")
    n = w.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye[None], 0.0, w)


def _part_weight(i: int, n_part: int, point_num: int, w_part_mode: str,
                 edited_mask, n_edited):
    """Per-part loss weight (train_funcs.py:243-284 w_part_mode semantics)."""
    if w_part_mode == "n/N":
        return n_part / point_num
    if w_part_mode == "1/K":
        return 1.0 / N_PARTS
    if w_part_mode == "1/rand_num":
        if edited_mask is None or n_edited is None:
            return 1.0 / N_PARTS
        return jnp.where(edited_mask[i] > 0,
                         0.99 / jnp.maximum(n_edited, 1),
                         0.01 / jnp.maximum(N_PARTS - n_edited, 1))
    raise ValueError(f"unknown w_part_mode {w_part_mode!r}")


def weighted_distance_loss(tx_nodummy, rec_nodummy, kps_full, tables: LossTables,
                           a_full=None, edited_mask=None, n_edited=None,
                           w_mode: str = "threshold", w_threshold: float = 0.8,
                           w_part_mode: str = "1/K", relat: bool = True,
                           leafkeep: bool = True, fused: bool | None = None):
    """Orientation-adaptive weighted intra-part distance-matrix loss.

    a_full [B, 17] scales the GT distance matrix of edited parts (1.0
    elsewhere); edited_mask [17] + n_edited drive the '1/rand_num' part
    weighting.  Masked means replicate the reference's nozero_index
    filtering (train_funcs.py:272-283).

    The orientation angle is computed inline from the GT distance matrix:
    (v_i - v_j)·bone == s_i - s_j with s = v·bone, so the [B, n, n, 3]
    pair-direction tensor of the naive formulation (utils_SH.py:442-478,
    ops.skeleton.angle_weights) is never materialized and the pairwise
    distances are shared with the loss itself.

    `fused` (default: auto-probe) routes the per-part tile math through the
    VMEM-resident Pallas kernel (ops.pallas.part_dist_pallas) — identical
    sums without materializing any [B, n, n] tensor in HBM.  Measured at
    B=128: +2.4% full-step throughput (the loss is VPU-compute-bound, so
    the traffic win mostly converts to ~1.4 GB lower peak memory)."""
    a_, b1_, b2_ = bone_endpoint_arrays(SKL_LIST)
    bones = bone_vectors(kps_full, a_, b1_, b2_)        # [B, 17, 3]
    bone_norm = jnp.linalg.norm(bones, axis=-1)         # [B, 17]
    point_num = tx_nodummy.shape[1]

    def jnp_part_li(i, idx):
        """One part's masked mean term — the reference formulation."""
        idxj = jnp.asarray(idx)
        vp = jnp.take(tx_nodummy, idxj, axis=1)         # [B, n, 3]
        de0 = pairwise_dist(vp)                         # unscaled GT dists
        s = jnp.einsum("bnd,bd->bn", vp, bones[:, i, :])
        dot = s[:, :, None] - s[:, None, :]
        cos = jnp.abs(dot) / (de0 * bone_norm[:, i, None, None])
        cos = jnp.clip(jnp.where(jnp.isnan(cos), 1.0, cos), 0.0, 1.0)
        ang = jnp.arccos(cos) * (180.0 / jnp.pi)
        de = de0 if a_full is None else de0 * a_full[:, i][:, None, None]
        w = _distance_weights(ang, i, w_mode, w_threshold, leafkeep)
        mask = (w * de) != 0.0
        de_r = masked_pairwise_dist(jnp.take(rec_nodummy, idxj, axis=1), mask)
        count = jnp.maximum(jnp.sum(mask), 1)
        if relat:
            de_safe = jnp.where(mask, de, 1.0)
            term = jnp.abs(w * (de_r / de_safe) - w)
        else:
            term = jnp.abs(w * de_r - w * de)
        return jnp.sum(jnp.where(mask, term, 0.0)) / count

    if fused is None:
        from ..ops.pallas.part_dist_pallas import (bucket_n_pads,
                                                   fused_dist_available)
        fused = fused_dist_available(bucket_n_pads(tables.part_indices))
    if fused:
        from ..ops.pallas.part_dist_pallas import (PartDistTables,
                                                   fused_part_sums)
        ptab = PartDistTables(tables.part_indices, leafkeep, w_mode)
        li_by_part = {}
        if ptab.fused_ids:
            sums, counts = fused_part_sums(
                tx_nodummy, rec_nodummy, bones, ptab, a_full=a_full,
                w_mode=w_mode, w_threshold=w_threshold, relat=relat)
            for pos, i in enumerate(ptab.fused_ids):
                li_by_part[i] = sums[pos] / jnp.maximum(counts[pos], 1.0)
        for i in ptab.oversize_ids:   # too big for VMEM tiles -> jnp path
            li_by_part[i] = jnp_part_li(i, tables.part_indices[i])
        total = 0.0
        for i in range(ptab.n_parts):
            total = total + _part_weight(
                i, ptab.sizes[i], point_num, w_part_mode, edited_mask,
                n_edited) * li_by_part[i]
        return total

    total = 0.0
    for i, idx in enumerate(tables.part_indices):
        total = total + _part_weight(i, len(idx), point_num, w_part_mode,
                                     edited_mask, n_edited) * jnp_part_li(i, idx)
    return total


def volume_loss(tx_nodummy, rec_nodummy, tables: LossTables, gt_vols=None):
    """mean over batch and non-leaf parts of | |rec_vol/gt_vol| − 1 |.

    gt_vols [B, P']: optionally precomputed GT part volumes (pure
    per-sample data function — staged once by the device-resident
    pipeline; per-sample face reduction, same values up to f32 reduction
    order)."""
    faces = jnp.asarray(tables.faces)
    mask = jnp.asarray(tables.face_part_mask)
    rec_vol = signed_part_volumes(rec_nodummy, faces, mask)   # [B, P']
    gt_vol = (signed_part_volumes(tx_nodummy, faces, mask)
              if gt_vols is None else gt_vols)
    ratio = jnp.abs(rec_vol / gt_vol)
    return jnp.mean(jnp.abs(ratio - 1.0))


def regress_kps(verts_nodummy, j_regressor):
    """[B, V, 3] -> [B, 35, 3] full keypoints."""
    return jnp.einsum("jv,bvd->bjd", j_regressor, verts_nodummy)


def edge_loss(tx_nodummy, rec_nodummy, edge_verts):
    """Unique-edge length consistency over the mesh edge list [E, 2]
    (the reference defines this as Edge_loss and loads its asset but never
    calls it, train_funcs.py:41-44,104 — provided here as a working op)."""
    e = jnp.asarray(edge_verts)
    def lengths(v):
        return jnp.linalg.norm(jnp.take(v, e[:, 0], axis=1)
                               - jnp.take(v, e[:, 1], axis=1), axis=-1)
    return jnp.mean(jnp.abs(lengths(rec_nodummy) - lengths(tx_nodummy)))
