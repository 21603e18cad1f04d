"""Mesh pooling / unpooling as gathers (one-hot MXU matmuls at small batch).

The reference densifies its sparse transforms into [V+1, V'+1] matrices and
batch-matmuls every step (main.py:183-193, models.py:127,148).  Because QEM
downsampling is a pure row selection (1 nnz/row) and barycentric upsampling
has <=3 nnz/row, both collapse to index gathers — O(V*C) HBM traffic instead
of O(V*V') FLOPs, with identical results.

Small-batch exception (r3, measured): XLA's gather/scatter engine costs
~100 ns/row regardless of row width and independent of batch, so at small
batch the take's row floor (and its backward's scatter-add) dominates while
the MXU idles.  Building the sparse operator as an on-the-fly one-hot
matrix (iota-compare, fused by XLA — no multi-MB constant in the program)
turns both directions into matmuls.  Unlike the reference's dense [V+1,V'+1]
batch-matmul per SAMPLE, this is one [V_f, V_c] x [V_c, B*C] matmul per
CALL, and only where measured profitable (benchmarks/coarse_trunk_probe.py,
v5e, fwd+bwd vs take): unpool L0/L1/L2 at B=4 3.9x/3.1x/2.2x, at B=12
5.7x/3.3x/1.9x; unpool L3 1.65x/1.31x (two clean re-runs — an earlier
1.05x reading was host-contention noise, so L3 is now IN); pool wins at
every level, B=4/12 means 1.65x/1.35x/1.2x/1.2x for L0-L3.  A
Precision.HIGHEST unpool variant (exact f32 via the 6-pass bf16
expansion) measured 0.3-0.9x — slower than the take baseline at L0-L2 —
and is rejected; DEFAULT precision stands with the note below.  At B>=32
the matmul FLOPs outgrow the batch-independent row floor (same finding
as the spiral one-hot path, ops/spiral_conv.py).

Precision note: the MXU truncates f32 operands to bf16 per pass under the
DEFAULT matmul precision, so the dense path carries ~1e-2 abs rounding on
N(0,1) activations where take+einsum is exact.  This matches the precision
of every conv matmul in the trunk (also DEFAULT) — the unpool output feeds
straight into a spiral conv whose matmul truncates its operands the same
way — and the paper recipe trains to its best measured error with the
analogous one-hot conv path active.  Tests pin exact equality on CPU
(where DEFAULT is full f32) and the gate keeps batch-major take for
everything the rule does not cover, including symbolic-batch serving
exports (the gate needs a concrete int batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .banding import banded_apply

# one-hot paths engage only below this concrete batch (measured knee: the
# matmul's FLOPs scale with B, the take's row floor does not; B=12 still
# wins, B>=32 loses) and at/above this fine-row count (every production
# level qualifies — smallest measured win is V_f=863 at 1.3-1.7x; the
# floor only guards unmeasured tiny meshes like the 16-vertex test human)
_ONEHOT_MAX_B = 16
_ONEHOT_MIN_ROWS = 512


def _onehot_ok(b, vf1: int) -> bool:
    """Trace-time dispatch for the one-hot sampling paths.  Requires a
    concrete int batch (symbolic-batch serving exports fall through to the
    shape-polymorphic take) and a non-CPU backend: the win is specific to
    the TPU gather engine's per-row floor — on CPU the dense matmul is
    strictly slower (and its 3-term sum reassociation would perturb the
    full-scale CPU parity tests, pinned at 3e-8); GPU gathers are cheap and
    the one-hot premise is unmeasured there."""
    return (isinstance(b, int) and b <= _ONEHOT_MAX_B
            and vf1 >= _ONEHOT_MIN_ROWS and jax.default_backend() in ("tpu", "axon"))


# measured adoption region of the banded sampling forms (r4 on-chip probe,
# benchmarks/banded_gather_probe.py, fwd+bwd vs take at c=16):
#   unpool: B=128 L0 1.80x, L1 1.62x -> ADOPT; B=384 L0 1.00x, L1 1.16x
#     (below the 1.2x bar) -> capped at 128.  Small batch stays one-hot
#     (dispatch order).
#   pool:   B=128 0.40x/0.90x, B=384 0.32x/0.56x -> REJECTED at every
#     measured batch (pool gathers 1 row/output — the take is already
#     near its floor and the selection matmul only adds FLOPs).
_UNPOOL_BAND_MAX_B = 128


def _unpool_band_ok(b) -> bool:
    """Trace-time dispatch for the block-banded unpool path: which levels
    carry a band is decided where tables are built (models/tables); the
    measured small-batch one-hot adoption takes precedence (dispatch
    order), so banding engages in the measured mid-batch window only —
    see _UNPOOL_BAND_MAX_B above — and only on the TPU backends whose
    gather row floor motivated it.  Needs a concrete int batch
    (symbolic-batch serving exports fall through to take)."""
    return (isinstance(b, int) and b <= _UNPOOL_BAND_MAX_B
            and jax.default_backend() in ("tpu", "axon"))


def _pool_band_ok(b) -> bool:
    """Banded pool is measured-REJECTED at every probed batch (see the
    table above): the production gate never routes to it.  The form and
    its tests remain as the reproducible record (tests force this gate)."""
    return False


def pool_dense(x: jnp.ndarray, pool_idx: jnp.ndarray) -> jnp.ndarray:
    """pool as P @ x with P = one_hot(pool_idx) built on the fly inside
    the trace.  Forward trades a [V_c+1]-row gather for a matmul; the VJP
    becomes P^T @ dy — a matmul instead of a scatter-add into V_f+1 rows."""
    b, vf1, c = x.shape
    vc1 = pool_idx.shape[0]
    p = jax.nn.one_hot(pool_idx, vf1, dtype=x.dtype)
    xp = jnp.transpose(x, (1, 0, 2)).reshape(vf1, b * c)
    y = jnp.dot(p, xp, preferred_element_type=jnp.float32)
    return jnp.transpose(y.reshape(vc1, b, c), (1, 0, 2)).astype(x.dtype)


def pool_take(x: jnp.ndarray, pool_idx: jnp.ndarray) -> jnp.ndarray:
    """pool as a plain row-selection gather (the baseline form)."""
    return jnp.take(x, pool_idx, axis=1)


def pool_banded(x: jnp.ndarray, pool_idx: jnp.ndarray, band) -> jnp.ndarray:
    """pool as a BLOCK-BANDED one-hot matmul (ops/banding.py): QEM keeps
    collapse survivors in fine-index order, so pool_idx is near-diagonal
    with a 2x stretch — a [R, W] window per block covers it with ZERO
    out-of-band entries on the production topology (R=128, W=384), cutting
    the dense form's [V_c, V_f] K-dim to W and keeping the VJP a matmul."""
    b, vf1, c = x.shape
    vc1 = pool_idx.shape[0]
    r, w_, nblk = band.R, band.W, band.nblk
    idx_pad = jnp.pad(pool_idx, (0, nblk * r - vc1),
                      constant_values=-(w_ + 1))
    rel = (idx_pad.reshape(nblk, r) + w_
           - jnp.asarray(band.starts, jnp.int32)[:, None])
    p = (rel[..., None] == jnp.arange(w_, dtype=jnp.int32)).astype(x.dtype)
    xp = jnp.transpose(x, (1, 0, 2)).reshape(vf1, b * c)
    y = banded_apply(xp, p, band, vc1)
    if band.fix_pos.size:
        y = y.at[jnp.asarray(band.fix_pos)].add(
            jnp.take(xp, jnp.asarray(band.fix_src), axis=0))
    return jnp.transpose(y.reshape(vc1, b, c), (1, 0, 2))


def pool(x: jnp.ndarray, pool_idx: jnp.ndarray, band=None) -> jnp.ndarray:
    """x [B, V_f+1, C], pool_idx [V_c+1] -> [B, V_c+1, C] by row selection
    (one-hot matmul at small B — measured 1.2-1.7x fwd+bwd on all levels;
    block-banded matmul when the tables carry a band)."""
    b, vf1, _ = x.shape
    if _onehot_ok(b, vf1):
        return pool_dense(x, pool_idx)
    if band is not None and _pool_band_ok(b):
        return pool_banded(x, pool_idx, band)
    return pool_take(x, pool_idx)


def unpool_dense(x: jnp.ndarray, unpool_idx: jnp.ndarray,
                 unpool_w: jnp.ndarray) -> jnp.ndarray:
    """unpool as U @ x with U = sum_k one_hot(idx_k) * w_k built on the fly
    inside the trace (iota-compare, fused by XLA).  The VJP is U^T @ dy —
    a matmul instead of a scatter-add over V_f*3 rows."""
    b, vc1, c = x.shape
    vf1 = unpool_idx.shape[0]
    w = unpool_w.astype(x.dtype)
    u = sum(jax.nn.one_hot(unpool_idx[:, k], vc1, dtype=x.dtype)
            * w[:, k:k + 1] for k in range(unpool_idx.shape[1]))
    xp = jnp.transpose(x, (1, 0, 2)).reshape(vc1, b * c)
    y = jnp.dot(u, xp, preferred_element_type=jnp.float32)
    return jnp.transpose(y.reshape(vf1, b, c), (1, 0, 2)).astype(x.dtype)


def unpool_take(x: jnp.ndarray, unpool_idx: jnp.ndarray,
                unpool_w: jnp.ndarray) -> jnp.ndarray:
    """unpool as a barycentric 3-gather + weighted sum (the baseline form)."""
    b, _, c = x.shape
    vf1 = unpool_idx.shape[0]
    g = jnp.take(x, unpool_idx.reshape(-1), axis=1).reshape(b, vf1, 3, c)
    return jnp.einsum("bvkc,vk->bvc", g, unpool_w.astype(x.dtype))


def unpool_banded(x: jnp.ndarray, unpool_idx: jnp.ndarray,
                  unpool_w: jnp.ndarray, band) -> jnp.ndarray:
    """unpool as a BLOCK-BANDED weighted matmul (ops/banding.py): each fine
    vertex's <=3 barycentric parents sit near fine_index/2, so an [R, W]
    window per block leaves ~1% out-of-band (fixed up exactly by a sparse
    weighted gather+add whose weights ride in band.fix_pos order)."""
    b, vc1, c = x.shape
    vf1 = unpool_idx.shape[0]
    r, w_, nblk = band.R, band.W, band.nblk
    wgt = unpool_w.astype(x.dtype)
    idx_pad = jnp.pad(unpool_idx, ((0, nblk * r - vf1), (0, 0)),
                      constant_values=-(w_ + 1))
    w_pad = jnp.pad(wgt, ((0, nblk * r - vf1), (0, 0)))
    rel = (idx_pad.reshape(nblk, r, 3) + w_
           - jnp.asarray(band.starts, jnp.int32)[:, None, None])
    u = jnp.sum((rel[..., None] == jnp.arange(w_, dtype=jnp.int32))
                .astype(x.dtype) * w_pad.reshape(nblk, r, 3)[..., None],
                axis=2)                                  # [nblk, R, W]
    xp = jnp.transpose(x, (1, 0, 2)).reshape(vc1, b * c)
    y = banded_apply(xp, u, band, vf1)
    if band.fix_pos.size:
        # fix_pos is flat v*3+k: the fixup source's weight is w[v, k]
        fp = jnp.asarray(band.fix_pos)
        fw = wgt.reshape(-1)[fp]
        y = y.at[fp // 3].add(fw[:, None]
                              * jnp.take(xp, jnp.asarray(band.fix_src),
                                         axis=0))
    return jnp.transpose(y.reshape(vf1, b, c), (1, 0, 2))


def unpool_banded_pallas(x: jnp.ndarray, unpool_idx: jnp.ndarray,
                         unpool_w: jnp.ndarray, band) -> jnp.ndarray:
    """unpool as the VMEM-fused Pallas block-diagonal gather
    (ops/pallas/banded_gather_pallas.py): the <=3 weighted taps ride as
    flat [V_f*3] rows with the barycentric weights folded into the
    selection tiles; the tap sum happens on the reshaped result.  Same
    exact out-of-band fixup as unpool_banded."""
    from .pallas.banded_gather_pallas import diag_banded_gather
    b, vc1, c = x.shape
    vf1 = unpool_idx.shape[0]
    spec = band.diag
    wgt = unpool_w.astype(jnp.float32)
    import numpy as np
    w_pad = np.zeros((spec.nblk * spec.R, 3), np.float32)
    w_pad[:vf1] = np.asarray(unpool_w, np.float32)
    xp = jnp.transpose(x, (1, 0, 2)).reshape(vc1, b * c)
    g = diag_banded_gather(xp, w_pad.reshape(spec.nblk, spec.R * 3), spec)
    if spec.fix_pos.size:
        fp = jnp.asarray(spec.fix_pos)
        fw = wgt.reshape(-1)[fp].astype(xp.dtype)
        g = g.at[fp].add(fw[:, None]
                         * jnp.take(xp, jnp.asarray(spec.fix_src), axis=0))
    y = jnp.sum(g.reshape(vf1, 3, b, c), axis=1)
    return jnp.transpose(y, (1, 0, 2))


def unpool(x: jnp.ndarray, unpool_idx: jnp.ndarray,
           unpool_w: jnp.ndarray, band=None) -> jnp.ndarray:
    """x [B, V_c+1, C], unpool_idx [V_f+1, 3], unpool_w [V_f+1, 3]
    -> [B, V_f+1, C] via barycentric 3-gather (one-hot matmul at small B;
    block-banded matmul when the tables carry a band)."""
    b, _, _ = x.shape
    vf1 = unpool_idx.shape[0]
    if _onehot_ok(b, vf1):
        return unpool_dense(x, unpool_idx, unpool_w)
    if band is not None and _unpool_band_ok(b):
        from .spiral_conv import _banded_pallas_ok
        if _banded_pallas_ok(band):
            return unpool_banded_pallas(x, unpool_idx, unpool_w, band)
        return unpool_banded(x, unpool_idx, unpool_w, band)
    return unpool_take(x, unpool_idx, unpool_w)
