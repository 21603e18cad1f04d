"""On-device body measurement (reference: utils_SH.py:144-161
measure_body_quick) — precomputed girth polylines + bone lengths, jittable."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .skeleton import bone_lengths, expand_kps


def pack_girth_tables(girth_edges, girth_factors):
    """Pad ragged per-part girth polylines into dense arrays:
    (edge_idx [P, Emax, 2] int32, factors [P, Emax] f32, mask [P, Emax])."""
    n_parts = len(girth_edges)
    emax = max(len(e) for e in girth_edges)
    idx = np.zeros((n_parts, emax, 2), dtype=np.int32)
    fac = np.zeros((n_parts, emax), dtype=np.float32)
    mask = np.zeros((n_parts, emax), dtype=np.float32)
    for p in range(n_parts):
        e = np.asarray(girth_edges[p], dtype=np.int32)
        f = np.asarray(girth_factors[p], dtype=np.float32).reshape(len(e), -1)[:, 0]
        idx[p, :len(e)] = e
        fac[p, :len(e)] = f
        mask[p, :len(e)] = 1.0
        # pad by repeating the last point so padded segments have length 0
        idx[p, len(e):] = e[-1]
        fac[p, len(e):] = f[-1]
    return idx, fac, mask


def girths(verts: jnp.ndarray, edge_idx, factors) -> jnp.ndarray:
    """verts [B, V, 3] -> [B, P] closed-polyline girths."""
    p0 = jnp.take(verts, edge_idx[..., 0].reshape(-1), axis=1)
    p1 = jnp.take(verts, edge_idx[..., 1].reshape(-1), axis=1)
    b = verts.shape[0]
    n_parts, emax = edge_idx.shape[:2]
    p0 = p0.reshape(b, n_parts, emax, 3)
    p1 = p1.reshape(b, n_parts, emax, 3)
    f = jnp.asarray(factors)[None, :, :, None]
    pts = p0 * (1.0 - f) + p1 * f                          # [B, P, E, 3]
    closed = jnp.concatenate([pts, pts[:, :, :1]], axis=2)
    seg = jnp.linalg.norm(jnp.diff(closed, axis=2), axis=-1)
    return jnp.sum(seg, axis=-1)


def measure_body(verts: jnp.ndarray, j_regressor: jnp.ndarray,
                 edge_idx, factors, skl_list) -> jnp.ndarray:
    """[B, 32]-style measure vector: girths then bone lengths."""
    g = girths(verts, edge_idx, factors)
    kps = jnp.einsum("jv,bvd->bjd", j_regressor.astype(verts.dtype), verts)
    ln = bone_lengths(expand_kps(kps), skl_list)
    return jnp.concatenate([g, ln], axis=-1)
