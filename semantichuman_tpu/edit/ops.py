"""Pure latent/skeleton edit operations (vectorized, jit-safe).

The four semantic edits of the reference demo (demo.py:75-93) plus latent
interpolation, each as a standalone function over latent / skeleton arrays:

  * transplant_orientation — bone directions from a donor skeleton;
  * scale_bone_length     — per-bone length scaling;
  * scale_girth           — per-part shape-latent magnitude scaling;
  * style_transfer_z      — donor latent direction at the source's norm;
  * interpolate_z         — linear latent interpolation.

Skeletons are the [B, 31, 4] (unit-dir, length) representation produced by
ops.skeleton.kps2skl(mode='ori_m'); latents are [B, 17, nz] part latents.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import NEWSKL_LIST, PART_LIST


def _part_idx(parts) -> np.ndarray:
    """Part names or indices -> int index array."""
    out = []
    for p in np.atleast_1d(parts):
        if isinstance(p, (str, np.str_)):
            if p not in PART_LIST:
                raise ValueError(
                    f"unknown part {p!r}; choose from {PART_LIST}")
            out.append(PART_LIST.index(p))
        else:
            q = int(p)
            if not 0 <= q < len(PART_LIST):
                raise ValueError(
                    f"part index {q} out of range [0, {len(PART_LIST)})")
            out.append(q)
    return np.asarray(out, dtype=np.int32)


def _bone_idx(bones) -> np.ndarray:
    idx = np.asarray(bones, dtype=np.int32).reshape(-1)
    if idx.size and (idx.min() < 0 or idx.max() >= len(NEWSKL_LIST)):
        raise ValueError(f"bone index out of range [0, {len(NEWSKL_LIST)})")
    return idx


def transplant_orientation(skl: jnp.ndarray, donor_skl: jnp.ndarray,
                           bones) -> jnp.ndarray:
    """skl, donor_skl [B, 31, 4] -> skl with the chosen bones' unit
    directions replaced by the donor's (lengths kept — demo.py:77-79)."""
    idx = _bone_idx(bones)
    return skl.at[:, idx, :3].set(donor_skl[:, idx, :3])


def scale_bone_length(skl: jnp.ndarray, bones, factor) -> jnp.ndarray:
    """Multiply the chosen bones' lengths by `factor` (scalar, per-bone
    [len(bones)], or per-sample [B, len(bones)] — demo.py:81-84)."""
    idx = _bone_idx(bones)
    return skl.at[:, idx, 3].multiply(jnp.asarray(factor))


def scale_girth(z: jnp.ndarray, parts, factor) -> jnp.ndarray:
    """Scale the chosen parts' shape latents: z_part <- factor * z_part.
    The latent-norm <-> measure correspondence trained by zpartreg makes this
    a physical girth edit (demo.py:86)."""
    idx = _part_idx(parts)
    return z.at[:, idx, :].multiply(jnp.asarray(factor))


def style_transfer_z(z: jnp.ndarray, donor_z: jnp.ndarray,
                     parts=None, eps: float = 1e-12) -> jnp.ndarray:
    """Keep each part latent's norm (the body measure) but take its
    *direction* (the style) from the donor (demo.py:88-93)."""
    norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
    donor_dir = donor_z / (jnp.linalg.norm(donor_z, axis=-1, keepdims=True)
                           + eps)
    styled = norm * donor_dir
    if parts is None:
        return styled
    idx = _part_idx(parts)
    return z.at[:, idx, :].set(styled[:, idx, :])


def interpolate_z(z_a: jnp.ndarray, z_b: jnp.ndarray, t) -> jnp.ndarray:
    """Linear interpolation (1-t)*z_a + t*z_b; t scalar or broadcastable."""
    t = jnp.asarray(t)
    return (1.0 - t) * z_a + t * z_b
