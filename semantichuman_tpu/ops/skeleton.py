"""Skeleton algebra, fully vectorized for the device.

Replaces the reference's per-bone Python loops (utils_SH.py:26-98,412-478)
with precomputed index arrays + single gathers/matmuls:

  * kps2skl — bone (direction, length) extraction via endpoint gathers;
  * skl2kps — tree re-integration as ONE matmul against a precomputed
    root-to-joint path matrix (the reference integrates bone-by-bone);
  * edit_skl — subtree translation for bone-length edits via a precomputed
    descendant mask;
  * angle_weights — per-part angles between intra-part vertex-pair
    directions and the part's bone direction (the orientation-adaptive
    distance-loss weights, utils_SH.py:442-478).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import (CHILD_DICT, KPS_KEEP, N_KPS_FULL, NEWSKL_LIST,
                         PARENT_DICT, bone_endpoint_arrays, skl_path_matrix)

_A, _B1, _B2 = bone_endpoint_arrays(NEWSKL_LIST)
_PATH = skl_path_matrix(NEWSKL_LIST)          # [35, 31]
_KPS_KEEP = np.asarray(KPS_KEEP, dtype=np.int32)


def expand_kps(kps: jnp.ndarray) -> jnp.ndarray:
    """[B, 32, 3] kept keypoints -> [B, 35, 3] with dropped joints zeroed."""
    if kps.shape[1] == N_KPS_FULL:
        return kps
    full = jnp.zeros((kps.shape[0], N_KPS_FULL, 3), dtype=kps.dtype)
    return full.at[:, _KPS_KEEP, :].set(kps)


def bone_vectors(kps_full: jnp.ndarray, idx_a, idx_b1, idx_b2) -> jnp.ndarray:
    """[B, n_bones, 3] vec = kps[a] - midpoint(kps[b1], kps[b2])."""
    a = jnp.take(kps_full, idx_a, axis=1)
    b = 0.5 * (jnp.take(kps_full, idx_b1, axis=1)
               + jnp.take(kps_full, idx_b2, axis=1))
    return a - b


def kps2skl(kps: jnp.ndarray, mode: str = "ori_m") -> jnp.ndarray:
    """kps [B, 32|35, 3] -> skeleton representation.

    mode: 'ori_m'/'kps_ori_m' -> [B, 31, 4] (unit dir, length);
          'vec_m' -> [B, 31, 4] (raw vec, length);
          'vec'   -> [B, 31, 3]; 'm' -> [B, 31, 1].
    """
    kps_full = expand_kps(kps)
    vec = bone_vectors(kps_full, _A, _B1, _B2)
    length = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    if mode in ("ori_m", "kps_ori_m"):
        return jnp.concatenate([vec / length, length], axis=-1)
    if mode == "vec_m":
        return jnp.concatenate([vec, length], axis=-1)
    if mode == "vec":
        return vec
    if mode == "m":
        return length
    raise ValueError(f"unknown skl mode {mode!r}")


def skl2kps(skl: jnp.ndarray, mode: str = "ori_m") -> jnp.ndarray:
    """Inverse of kps2skl: re-integrate bone vectors from the root.

    Returns kept keypoints [B, 32, 3].  kps[j] = -(sum of bone vectors on the
    root→j path), computed as one [35, 31] matmul.
    """
    if mode in ("ori_m", "kps_ori_m"):
        vec = skl[..., :3] * skl[..., 3:4]
    elif mode in ("vec", "vec_m"):
        vec = skl[..., :3]
    else:
        raise ValueError(f"unknown skl mode {mode!r}")
    path = jnp.asarray(_PATH, dtype=vec.dtype)        # [35, 31]
    kps_full = -jnp.einsum("jk,bkd->bjd", path, vec)
    return jnp.take(kps_full, _KPS_KEEP, axis=1)


def bone_lengths(kps_full: jnp.ndarray, skl_list) -> jnp.ndarray:
    """[B, n] lengths for an arbitrary bone table (2- or 3-entry bones)."""
    a, b1, b2 = bone_endpoint_arrays(skl_list)
    vec = bone_vectors(kps_full, a, b1, b2)
    return jnp.linalg.norm(vec, axis=-1)


def _descendants(joint: int) -> list[int]:
    out = [joint]
    for c in CHILD_DICT.get(joint, []):
        out += _descendants(c)
    return out


def edit_skl(kps: jnp.ndarray, kps_index: int, edit_length) -> jnp.ndarray:
    """Bone-length edit: translate joint `kps_index`'s whole subtree along the
    bone direction by (edit_length - 1)·(kps[j] - kps[parent])
    (reference: utils_SH.py:412-440).

    kps [B, 24+, 3] (full SMPL joint order), edit_length [B] or scalar.
    """
    parent = PARENT_DICT[kps_index]
    dirc = kps[:, kps_index, :] - kps[:, parent, :]
    scale = (jnp.asarray(edit_length) - 1.0).reshape(-1, 1)
    mask = np.zeros(kps.shape[1], dtype=np.float32)
    mask[_descendants(kps_index)] = 1.0
    delta = dirc[:, None, :] * scale[:, None, :] * jnp.asarray(mask)[None, :, None]
    return kps + delta


def angle_weights(verts: jnp.ndarray, kps_full: jnp.ndarray,
                  part_indices: list[np.ndarray], skl_list) -> list[jnp.ndarray]:
    """Per part: [B, n, n] angles (degrees, folded to [0, 90]) between every
    intra-part vertex-pair direction and the part's bone direction.

    NaNs from coincident vertices map to angle 0 (cos→1), exactly as the
    reference's nan-guard does (utils_SH.py:461-463).
    """
    a, b1, b2 = bone_endpoint_arrays(skl_list)
    bones = bone_vectors(kps_full, a, b1, b2)       # [B, n_parts, 3]
    bone_norm = jnp.linalg.norm(bones, axis=-1)     # [B, n_parts]
    out = []
    for p, idx in enumerate(part_indices):
        vp = jnp.take(verts, jnp.asarray(idx), axis=1)      # [B, n, 3]
        d = vp[:, :, None, :] - vp[:, None, :, :]           # [B, n, n, 3]
        d_norm = jnp.linalg.norm(d, axis=-1)                # [B, n, n]
        dot = jnp.einsum("bijd,bd->bij", d, bones[:, p, :])
        denom = d_norm * bone_norm[:, p, None, None]
        cos = jnp.abs(dot) / denom
        cos = jnp.where(jnp.isnan(cos), 1.0, cos)
        cos = jnp.clip(cos, 0.0, 1.0)
        out.append(jnp.arccos(cos) * (180.0 / jnp.pi))
    return out
