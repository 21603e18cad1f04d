"""Spiral convolution: the framework's core op.

y[b, v] = act(W @ concat_{s}(x[b, spiral[v, s]]) + bias),  dummy row zeroed.

The reference implements this as an advanced-indexing gather followed by
nn.Linear (models.py:34-53).  Here it is a `jnp.take` + one matmul, which XLA
fuses into an MXU-friendly kernel; `ops.pallas.spiral_conv_pallas` provides a
hand-fused VMEM-resident variant for the hot levels.

Dummy semantics: spiral tables arrive with pads already resolved to the
explicit dummy row index V (topology.compiler), the input's dummy row is
zero, and the output's dummy row is re-zeroed after the bias/activation —
bit-identical to the reference's mask multiply.

`spiral_conv` dispatches between two explicit forms (both exported so
benchmarks/tests can measure each against the other):
  * `spiral_conv_take`   — gather-based; the reference-shaped baseline,
    itself layout-switched by (batch, channel) regime;
  * `spiral_conv_onehot` — the gather as a one-hot MXU matmul, adopted for
    small-batch coarse levels on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .banding import banded_apply

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.02),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


# measured adoption region of the one-hot conv form (docs/BENCHMARKS.md):
# named so the derived roofline (benchmarks/row_floor_roofline.py) models
# the same gates the dispatcher runs
_ONEHOT_MAX_B = 16
_ONEHOT_MAX_V1 = 2048
# measured adoption region of the block-banded conv form (r4 on-chip probe,
# benchmarks/banded_gather_probe.py): banding wins at SMALL batch only —
# the selection-matmul FLOPs scale with batch, the gather row floor does
# not.  Fwd+bwd speedups vs the production take dispatcher at the fine
# levels (bf16 / f32): B=12 L0(3,16) 5.54x/5.28x, L0(16,16) 3.07x/2.87x,
# L1(16,32) 2.26x/2.59x, L1(32,32) 1.96x/2.23x; B=128 0.27-0.73x,
# B=384 0.16-0.45x — REJECTED at large batch.
_BANDED_MAX_B = 16


def _onehot_ok(b, v1: int) -> bool:
    """Trace-time dispatch for the small-batch one-hot conv path.  Needs a
    concrete int batch (symbolic-batch serving exports fall through to the
    shape-polymorphic gather) and a non-CPU backend: the win is specific to
    the TPU gather engine's ~100 ns/row floor — on CPU the [V1*S, V1]
    dense matmul is strictly slower (full-scale level 2 would build a
    ~95 MB one-hot operand per conv call), and the take path is exactly
    equal anyway (selection sums one product of a 1.0)."""
    return (isinstance(b, int) and b <= _ONEHOT_MAX_B
            and v1 <= _ONEHOT_MAX_V1
            and jax.default_backend() in ("tpu", "axon"))


def _banded_ok(b) -> bool:
    """Trace-time dispatch for the block-banded fine-level path: which
    levels carry a band is decided where tables are built (models/tables);
    here the path engages only at the measured-profitable SMALL batches
    (see _BANDED_MAX_B — at large batch the selection-matmul FLOPs outgrow
    the row floor and take wins) and only on the TPU backends it was
    designed and measured for (the gather row floor is a TPU-engine
    property; on CPU or GPU dense selection matmuls are unproven and take
    is exactly equal).  Needs a concrete int batch: symbolic-batch serving
    exports fall through to the shape-polymorphic gather."""
    return (isinstance(b, int) and b <= _BANDED_MAX_B
            and jax.default_backend() in ("tpu", "axon"))


def spiral_gather(x: jnp.ndarray, spiral_idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, V+1, C], spiral_idx [V+1, S] -> [B, V+1, S*C]."""
    b, _, c = x.shape
    v1, s = spiral_idx.shape
    g = jnp.take(x, spiral_idx.reshape(-1), axis=1)
    return g.reshape(b, v1, s * c)


def spiral_conv_onehot(x: jnp.ndarray, spiral_idx: jnp.ndarray,
                       w: jnp.ndarray, bias: jnp.ndarray,
                       activation: str = "elu",
                       compute_dtype=None) -> jnp.ndarray:
    """Small-batch coarse-level form: the gather (and its backward
    scatter-add) as a ONE-HOT MXU MATMUL.  XLA's gather/scatter engine
    costs ~100 ns/row regardless of row width, batch-independent — at
    small batch that row floor dominates the conv while the MXU idles; a
    one-hot selection matrix built on the fly (iota-compare, fused by XLA)
    turns both directions into matmuls.  FORWARD is bit-identical to the
    take path: the selection sums one product of a 1.0, and the MXU's
    DEFAULT-precision operand truncation is idempotent through the
    following conv matmul (which truncates the gathered values the same
    way on both paths).  BACKWARD cotangents take ONE extra bf16 rounding
    on TPU under an f32 trunk (G^T @ dy truncates dy per MXU pass where
    the take path's scatter-add accumulates exact f32) — the same
    magnitude as every trunk matmul's own rounding; both recipes train to
    reference-level error with these paths active (docs/BENCHMARKS.md).
    Measured on the v5e
    (benchmarks/coarse_trunk_probe.py, B=4 fwd+bwd): 2.26x / 1.98x / 1.57x
    on levels 2/3/4; REJECTED at L0 (0.76x — the [V1·S, V1] matmul's FLOPs
    outgrow the row floor), L1 (1.16x, below the 1.2x bar), and any level
    at B=128 (0.48x — FLOPs scale with B, the row floor doesn't)."""
    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, _, c = x.shape
    v1, s = spiral_idx.shape
    G = jax.nn.one_hot(spiral_idx.reshape(-1), v1, dtype=x.dtype)
    xp = jnp.transpose(x, (1, 0, 2)).reshape(v1, b * c)
    g = jnp.dot(G, xp, preferred_element_type=x.dtype)
    g = (g.reshape(v1, s, b, c).transpose(2, 0, 1, 3)
         .reshape(b, v1, s * c))
    y = jnp.dot(g, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[:, -1, :].set(0.0)


def spiral_conv_banded(x: jnp.ndarray, spiral_idx: jnp.ndarray, band,
                       w: jnp.ndarray, bias: jnp.ndarray,
                       activation: str = "elu",
                       compute_dtype=None) -> jnp.ndarray:
    """Fine-level form: the gather as a BLOCK-BANDED one-hot matmul.

    Exploits spiral locality (ops/banding.py): each block of R vertices
    reads almost all its spiral sources from a W-row window, so the
    selection matrix shrinks from [V1*S, V1] (the rejected full one-hot)
    to nblk x [R*S, W] — a V1/W FLOP cut — while the backward stays a
    transposed matmul instead of a scatter-add over V1*S rows.  The
    ~2% out-of-band tail is fixed up exactly by a sparse gather+add
    whose VJP is a scatter over only those rows.  Dummy pads hit no band
    column and contribute an exact zero (the dummy row is zero by
    construction), so the forward is bit-identical to the take path (MXU
    operand truncation is idempotent through the following conv matmul —
    see spiral_conv_onehot); backward cotangents take one extra bf16
    rounding on TPU under an f32 trunk, differ by f32 summation order
    elsewhere, and differ freely at the structurally-zero dummy row,
    whose cotangent the producing op's dummy re-zeroing discards.

    The selection tensor is built on the fly (iota-compare) from the
    spiral table — see ops/banding.py for why it must not be resident."""
    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, _, c = x.shape
    v1, s = spiral_idx.shape
    R, W, nblk = band.R, band.W, band.nblk
    # pad rows to nblk*R with a sentinel that can never hit a band column
    sp_pad = jnp.pad(spiral_idx, ((0, nblk * R - v1), (0, 0)),
                     constant_values=-(W + 1))
    rel = (sp_pad.reshape(nblk, R, s) + W
           - jnp.asarray(band.starts, jnp.int32)[:, None, None])
    G = (rel[..., None] == jnp.arange(W, dtype=jnp.int32)
         ).astype(x.dtype).reshape(nblk, R * s, W)
    xp = jnp.transpose(x, (1, 0, 2)).reshape(v1, b * c)
    g = banded_apply(xp, G, band, v1 * s)                # [V1*S, B*C]
    g = g.at[jnp.asarray(band.fix_pos)].add(
        jnp.take(xp, jnp.asarray(band.fix_src), axis=0))
    g = (g.reshape(v1, s, b, c).transpose(2, 0, 1, 3)
         .reshape(b, v1, s * c))
    y = jnp.dot(g, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[:, -1, :].set(0.0)


def _banded_pallas_ok(band) -> bool:
    """Gate for the Pallas block-diagonal banded gather
    (ops/pallas/banded_gather_pallas.py): the spec must carry a diag
    companion, the env must not disable it, and Mosaic must compile the
    kernel at this geometry on the current backend (probed once per
    geometry per process).  Engages INSIDE the regions the XLA band
    already owns (same measured dispatch gates) — it is a faster
    implementation of the same math, not a new adoption region."""
    import os
    if band is None or band.diag is None:
        return False
    if os.environ.get("SH_TPU_BANDED_PALLAS", "0") != "1":
        return False
    from .pallas.banded_gather_pallas import diag_gather_available
    return diag_gather_available(band.diag)


def spiral_conv_banded_pallas(x: jnp.ndarray, spiral_idx: jnp.ndarray,
                              band, w: jnp.ndarray, bias: jnp.ndarray,
                              activation: str = "elu",
                              compute_dtype=None) -> jnp.ndarray:
    """Fine-level form: the banded gather as a VMEM-fused Pallas kernel
    (ops/pallas/banded_gather_pallas.py) — identical math to
    spiral_conv_banded (the diag window is a superset of the XLA band's,
    the out-of-band tail uses the same exact sparse fixup), but the
    selection tensor never materializes in HBM and its build cost is
    batch-independent."""
    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    from .pallas.banded_gather_pallas import diag_banded_gather
    b, _, c = x.shape
    v1, s = spiral_idx.shape
    spec = band.diag
    xp = jnp.transpose(x, (1, 0, 2)).reshape(v1, b * c)
    g = diag_banded_gather(xp, None, spec)              # [V1*S, B*C]
    if spec.fix_pos.size:
        g = g.at[jnp.asarray(spec.fix_pos)].add(
            jnp.take(xp, jnp.asarray(spec.fix_src), axis=0))
    g = (g.reshape(v1, s, b, c).transpose(2, 0, 1, 3)
         .reshape(b, v1, s * c))
    y = jnp.dot(g, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[:, -1, :].set(0.0)


def spiral_conv_take(x: jnp.ndarray, spiral_idx: jnp.ndarray, w: jnp.ndarray,
                     bias: jnp.ndarray, activation: str = "elu",
                     compute_dtype=None) -> jnp.ndarray:
    """Gather-based spiral conv, layout-switched by (batch, channel):
    vertex-major take for narrow channels at large batch, einsum (S, C)
    contraction for wide channels at large batch, reference-shaped flat
    dot otherwise."""
    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        # cast BEFORE the gather: the [B, V+1, S*C] gathered buffer is the
        # dominant HBM traffic of the op, and a cast placed after it gets
        # elided under --xla_allow_excess_precision (measured no-op); the
        # pre-gather cast halves the materialized bytes (~28% faster
        # fwd+bwd on the largest level)
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, _, c = x.shape
    v1, s = spiral_idx.shape
    # `b >= 32` must stay False for a SYMBOLIC batch dim (jax.export shape
    # polymorphism: the comparison is inconclusive, and the batch-major
    # path below is shape-polymorphic while this layout flip keys on a
    # concrete batch)
    if c <= 4 and isinstance(b, int) and b >= 32:
        # narrow-channel convs gather 6-16 BYTE granules in batch-major
        # layout; flipping to vertex-major makes each gathered row B·C
        # contiguous elements (measured 1.39x fwd+bwd at the production
        # level-0 3-channel encoder conv, benchmarks/layout_probe.py)
        xt = jnp.transpose(x, (1, 0, 2))                     # [V+1, B, C]
        g = jnp.take(xt, spiral_idx.reshape(-1), axis=0)
        g = g.reshape(v1, s, b, c).transpose(0, 2, 1, 3).reshape(v1, b, s * c)
        y = jnp.dot(g, w, preferred_element_type=jnp.float32)
        y = act(y + bias.astype(y.dtype))
        y = y.at[-1, :, :].set(0.0)                          # dummy vertex
        return jnp.transpose(y, (1, 0, 2))
    if c >= 64 and isinstance(b, int) and b >= 32:
        # wide-channel large-batch convs: leave the (S, C) contraction to
        # dot_general as an einsum over the 4D gathered tensor instead of
        # reshaping to [B, V1, S*C] and matmul-ing flat.  Same math (f32
        # MXU accumulation either way; only the contraction order
        # differs), but measured 1.3-2.0x fwd+bwd at c_in >= 64 on the
        # v5e (benchmarks/vertex_major_trunk_probe.py: B=128 bf16 L4
        # 1.91x, dec-L3 2.00x, dec-L2 1.42x; B=64 f32 1.31-1.79x) — the
        # flat-reshape form makes XLA materialize an extra relayout copy
        # of the gathered buffer that the einsum form never creates.
        # Below c_in 64 the two forms tie (1.04-1.07x, not worth losing
        # bit-exactness with the reference-shaped flat dot); a SYMBOLIC
        # batch (serving exports) falls through — the comparison needs a
        # concrete int.  A full vertex-major trunk was probed at the same
        # time and REJECTED: the [V,B,C]-resident einsum form ties this
        # batch-major einsum at every level, so the layout flip buys
        # nothing the contraction form doesn't.
        g = jnp.take(x, spiral_idx.reshape(-1), axis=1)
        y = jnp.einsum("bvsc,scd->bvd", g.reshape(b, v1, s, c),
                       w.reshape(s, c, -1),
                       preferred_element_type=jnp.float32)
        y = act(y + bias.astype(y.dtype))
        return y.at[:, -1, :].set(0.0)
    feats = spiral_gather(x, spiral_idx)
    y = jnp.dot(feats, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    # zero the dummy (last) row so pads keep gathering zeros downstream
    return y.at[:, -1, :].set(0.0)


def spiral_conv(x: jnp.ndarray, spiral_idx: jnp.ndarray, w: jnp.ndarray,
                bias: jnp.ndarray, activation: str = "elu",
                compute_dtype=None, band=None) -> jnp.ndarray:
    """x [B, V+1, C_in], w [S*C_in, C_out], bias [C_out] -> [B, V+1, C_out].

    Dispatch order (same as ops/sampling.py): the MEASURED small-batch
    one-hot adoption first, then the block-banded form where the tables
    carry a band (ops/banding.py BandSpec; which levels carry one is
    decided in models/tables.py), then the gather baseline.  Today bands
    exist only at the fine levels where one-hot never fires, but the
    ordering keeps a future coarse-level band extension from silently
    overriding the measured one-hot regime."""
    b = x.shape[0]
    v1 = spiral_idx.shape[0]
    if _onehot_ok(b, v1):
        return spiral_conv_onehot(x, spiral_idx, w, bias, activation,
                                  compute_dtype)
    if band is not None and _banded_ok(b):
        if _banded_pallas_ok(band):
            return spiral_conv_banded_pallas(x, spiral_idx, band, w, bias,
                                             activation, compute_dtype)
        return spiral_conv_banded(x, spiral_idx, band, w, bias, activation,
                                  compute_dtype)
    return spiral_conv_take(x, spiral_idx, w, bias, activation,
                            compute_dtype)
