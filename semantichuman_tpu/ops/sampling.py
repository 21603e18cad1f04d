"""Mesh pooling / unpooling as gathers.

The reference densifies its sparse transforms into [V+1, V'+1] matrices and
batch-matmuls every step (main.py:183-193, models.py:127,148).  Because QEM
downsampling is a pure row selection (1 nnz/row) and barycentric upsampling
has ≤3 nnz/row, both collapse to index gathers — O(V·C) HBM traffic instead
of O(V·V') FLOPs, with identical results.
"""

from __future__ import annotations

import jax.numpy as jnp


def pool(x: jnp.ndarray, pool_idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, V_f+1, C], pool_idx [V_c+1] -> [B, V_c+1, C]."""
    return jnp.take(x, pool_idx, axis=1)


def unpool(x: jnp.ndarray, unpool_idx: jnp.ndarray,
           unpool_w: jnp.ndarray) -> jnp.ndarray:
    """x [B, V_c+1, C], unpool_idx [V_f+1, 3], unpool_w [V_f+1, 3]
    -> [B, V_f+1, C] via barycentric 3-gather."""
    b, _, c = x.shape
    vf1 = unpool_idx.shape[0]
    g = jnp.take(x, unpool_idx.reshape(-1), axis=1).reshape(b, vf1, 3, c)
    return jnp.einsum("bvkc,vk->bvc", g, unpool_w.astype(x.dtype))
