"""Geometry kernels: pairwise distance matrices, face edge lengths, signed
part volumes, vertex normals (reference: utils_distance.py, train_funcs.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    """[B, n, 3] -> [B, n, n] Euclidean distances, relu-guarded against
    negative numerical residue (reference: utils_distance.py:366-376)."""
    r = jnp.sum(x * x, axis=2)[:, :, None]
    inner = jnp.einsum("bnd,bmd->bnm", x, x)
    d2 = jax.nn.relu(r - 2.0 * inner + jnp.swapaxes(r, 1, 2))
    return jnp.sqrt(d2)


def masked_pairwise_dist(x: jnp.ndarray, grad_mask: jnp.ndarray) -> jnp.ndarray:
    """pairwise_dist with zero (not NaN) gradients wherever grad_mask is 0.

    sqrt'(0) = inf, so entries excluded from a loss must be cut from the
    gradient graph *before* the sqrt — the double-where trick.
    """
    r = jnp.sum(x * x, axis=2)[:, :, None]
    inner = jnp.einsum("bnd,bmd->bnm", x, x)
    d2 = jax.nn.relu(r - 2.0 * inner + jnp.swapaxes(r, 1, 2))
    safe = jnp.where(grad_mask, d2, 1.0)
    return jnp.where(grad_mask, jnp.sqrt(safe), 0.0)


def face_edge_lengths(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3], faces [F, 3] -> [B, 3, F] lengths of edges (AB, BC, AC) —
    the edge ordering the reference's edge regularizer uses
    (train_funcs.py:12-39)."""
    a = jnp.take(verts, faces[:, 0], axis=1)
    b = jnp.take(verts, faces[:, 1], axis=1)
    c = jnp.take(verts, faces[:, 2], axis=1)
    ab = jnp.linalg.norm(a - b, axis=-1)
    bc = jnp.linalg.norm(b - c, axis=-1)
    ac = jnp.linalg.norm(a - c, axis=-1)
    return jnp.stack([ab, bc, ac], axis=1)


def signed_part_volumes(verts: jnp.ndarray, faces: jnp.ndarray,
                        face_part_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] -> [B, P] signed volume contribution per part.

    vol_f = (v0 × v1) · v2 summed over faces wholly inside each part
    (reference: cal_volloss, train_funcs.py:56-71); face_part_mask [F, P]
    one-hot (all-zero rows for straddling faces)."""
    v0 = jnp.take(verts, faces[:, 0], axis=1)
    v1 = jnp.take(verts, faces[:, 1], axis=1)
    v2 = jnp.take(verts, faces[:, 2], axis=1)
    vol_f = jnp.sum(jnp.cross(v0, v1) * v2, axis=-1)       # [B, F]
    return jnp.einsum("bf,fp->bp", vol_f, face_part_mask.astype(vol_f.dtype))


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via segment-sum (replaces the reference's
    torch_scatter path — utils_distance.py:254-281)."""
    v0 = jnp.take(verts, faces[:, 0], axis=1)
    v1 = jnp.take(verts, faces[:, 1], axis=1)
    v2 = jnp.take(verts, faces[:, 2], axis=1)
    fn = jnp.cross(v1 - v0, v2 - v0)                        # [B, F, 3]
    n_verts = verts.shape[1]

    def scatter_one(fn_b):
        acc = jnp.zeros((n_verts, 3), fn_b.dtype)
        for k in range(3):
            acc = acc.at[faces[:, k]].add(fn_b)
        return acc

    normals = jax.vmap(scatter_one)(fn)
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / jnp.maximum(norm, 1e-12)


def total_mesh_volume(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """[B] signed enclosed volume (reference: utils_distance.py:157-163)."""
    v0 = jnp.take(verts, faces[:, 0], axis=1)
    v1 = jnp.take(verts, faces[:, 1], axis=1)
    v2 = jnp.take(verts, faces[:, 2], axis=1)
    xp = jnp.cross(v1 - v0, v2 - v0)
    tc = (v0 + v1 + v2) / 3.0
    return jnp.sum(xp * tc / 6.0, axis=(1, 2))
