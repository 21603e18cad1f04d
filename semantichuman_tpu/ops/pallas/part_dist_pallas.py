"""Fused Pallas kernel for the weighted intra-part distance loss.

The jnp formulation (train/losses.py:weighted_distance_loss, mirroring
reference train_funcs.py:243-284/353-389) materializes several [B, n, n]
tensors per part in HBM — measured 72.9 ms of the 246 ms full train step at
B=128 (benchmarks/step_breakdown.py), the largest cost outside the conv
trunk.  This kernel keeps every [n, n] tile VMEM-resident: one grid program
per (part, batch-element) computes GT distances, orientation weights, and
the masked reconstruction-distance sums in one pass, emitting only two
scalars (term sum, mask count).  HBM traffic collapses from O(B·Σn²) to
O(B·Σn).

Gradients flow ONLY to the reconstruction (`rp`): GT vertices, bones and
edit factors are training data, so the custom VJP recomputes the tile and
contracts the coefficient matrix against rp rows on the MXU:

    d_rp = 2 · (rp · rowsum(coef) − coef @ rp),   coef[j,k] = g[j,k]/de_r[j,k]

— no scatter, one matmul per tile.

Two VJP strategies (SH_TPU_DIST_ONEPASS env; default one-pass since the
r4 on-chip A/B measured -25.1 ms/step at B=128, see _one_pass_grad):
  * two-kernel (=0): the backward kernel RECOMPUTES w/de/mask/de_r
    from the stashed inputs — minimal residual memory, but the kernel is
    VPU-bound and the ~20 vector passes run twice per branch;
  * one-pass (default): the gradient is linear in the upstream cotangent,
    so the forward kernel also emits the UNSCALED gradient g0 and the VJP
    is one elementwise g0·ct multiply — the recompute disappears for
    O(B·Σn·128) f32 of streaming residual traffic.

Numerical divergences from the jnp path (documented, both intentional):
  * where the mask admits a pair whose reconstructed distance is exactly 0,
    the jnp path's sqrt yields an inf/NaN gradient; here the pair's
    gradient contribution is 0 (strictly safer);
  * w_mode='threshold' compares the weight against w_threshold after the
    arcsin-Taylor acos (~1e-7 abs error vs the jnp arccos), so a pair whose
    weight sits within that error of the threshold can flip in/out of the
    nonzero mask, perturbing the masked count and loss at ~1e-7 relative —
    behaviorally negligible, asserted within tolerance by tests.

Layout: vertices ride as [n_pad, 128] tiles with xyz in lanes 0-2 (lanes
3+ zero), so pair distances come from one vp @ vpᵀ MXU pass and the bone
projection from one skinny matmul; per-program scalars (true n,
uniform-weight flag, edit factor, VJP cotangent) ride in SMEM via scalar
prefetch.

Measured and REJECTED (r2, v5e, production shape P=17 B=128 n=408):
  * triangle-tiled forward (symmetric matrices -> only j<k pairs, 3x3
    tile grid with a scalar-prefetched active-tile table, pl.ds ref
    slices): 20.14 ms vs 18.05 ms full-matrix.  The n/3=136-lane tiles
    break 128-lane vectorization (every op pays a ragged second lane
    pass), and the lane-aligned alternative (4x128 tiles, n_pad 408->512)
    pads away exactly what the triangle saves.  At n ~= 3*128 the
    full-matrix kernel is the optimum.
  * the kernel is VPU-compute-bound, not HBM-bound: ~20 vector passes
    (2 sqrt, divides, acos poly) over Σn² elements; mode ablation
    fwd 18.05 (threshold) / 15.03 (sin) / 9.93 (all_one) ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import LEAF_PART_INDICES

_LANES = 128
_INTERPRET = False  # tests flip this on CPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# arcsin Taylor coefficients Σ c_n t^(2n+1), converged to f32 eps on
# t ∈ [0, 0.5] (Mosaic has no acos/asin primitive)
_ASIN_C = (1.0, 1.0 / 6.0, 0.075, 0.04464286, 0.03038194, 0.02237216,
           0.01735276, 0.01396484)


def _acos01(x):
    """arccos for x ∈ [0, 1] to ~f32 accuracy: range-reduce via
    arccos(x) = 2·arcsin(√((1−x)/2)) for x > 0.5, arcsin Taylor core."""
    small = x <= 0.5
    t = jnp.where(small, x, jnp.sqrt(jnp.maximum((1.0 - x) * 0.5, 0.0)))
    t2 = t * t
    p = _ASIN_C[-1]
    for c in _ASIN_C[-2::-1]:
        p = c + t2 * p
    asin_t = t * p
    return jnp.where(small, jnp.pi / 2.0 - asin_t, 2.0 * asin_t)


def _pair_dists(v):
    """v [n, 128] (xyz in lanes 0-2, rest zero) -> [n, n] distances."""
    r = jnp.sum(v * v, axis=1, keepdims=True)              # [n, 1]
    inner = jax.lax.dot_general(
        v, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [n, n]
    d2 = jax.nn.relu(r - 2.0 * inner + jnp.transpose(r))
    return jnp.sqrt(d2)


def _use_fast_acos(w_mode: str, w_threshold: float) -> bool:
    """Threshold-mode acos fast path (SH_TPU_DIST_FASTACOS env): valid only
    when every SURVIVING pair is guaranteed cos ≤ 0.5 — i.e. w_threshold >
    acos(0.5)·(2/π) = 2/3, so the arcsin range-reduction branch (sqrt + two
    selects) can be dropped with bit-identical surviving weights (see
    _weights_de_mask).  ADOPTED as the default after the r5 on-chip A/B
    (v5e, B=128 full step, back-to-back benches): with the q-dedup,
    204.8 -> 200.3 ms/step (625.0 -> 639.0 meshes/s; fast-acos increment
    alone 627.8 -> 639.0 = 3.6 ms vs the 4.6 ms derived prediction).  The
    combined 4.5 ms sits at 68% of the 6.6 ms prediction — below the
    formal 1.2x-of-predicted bar — but both levers are bit-identical
    post-mask (tests/test_pallas.py pins them against the jnp path), so
    there is no numerics risk to weigh against the measured win.
    SH_TPU_DIST_FASTACOS=0 restores the range-reduced acos."""
    import os
    return (w_mode == "threshold" and w_threshold >= 0.67
            and os.environ.get("SH_TPU_DIST_FASTACOS", "1") == "1")


def _weights_de_mask(vp, bone, n_real, allone, a, *, n_pad: int,
                     w_mode: str, w_threshold: float,
                     fast_acos: bool = False):
    """Forward tile shared by fwd/bwd kernels: (w, de, mask).

    Replicates losses._distance_weights + the de/mask construction: angles
    from |cos| = |s_j − s_k| / (de0 · ‖bone‖) with the 0/0→1 guard; the
    diagonal, padding rows/cols, and (w·de)==0 entries all masked.

    fast_acos (threshold mode, w_threshold ≥ 0.67 only): a surviving pair
    has w = acos(cos)·(2/π) ≥ τ > 2/3 ⟹ acos(cos) > π/3 ⟹ cos < 0.5 —
    exactly the arcsin-Taylor core's DIRECT branch, so its weight is
    bit-identical without the range-reduction sqrt and the two selects.  A
    pair with cos > 0.5 gets an inexact weight, but the truncated series is
    monotone in cos with w(0.5) = 0.667 ≤ τ, so the SAME threshold compare
    zeroes it on both paths: identical mask, identical surviving values,
    ~9 fewer VPU passes over the tile (derivation:
    benchmarks/dist_loss_roofline.py)."""
    de0 = _pair_dists(vp)                                   # [n, n]
    if w_mode == "all_one":
        w = jnp.ones((n_pad, n_pad), jnp.float32)
    else:
        s = jax.lax.dot_general(
            vp, bone, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [n, 1]
        dot = s - jnp.transpose(s)
        bn = jnp.sqrt(jnp.sum(bone * bone))
        denom = de0 * bn
        cos = jnp.where(denom > 0.0,
                        jnp.abs(dot) / jnp.where(denom > 0.0, denom, 1.0),
                        1.0)
        if fast_acos and w_mode == "threshold" and w_threshold >= 0.67:
            # cos ≥ 0 by construction, so clip's lower bound is a no-op
            cos = jnp.minimum(cos, 1.0)
            t2 = cos * cos
            p = _ASIN_C[-1]
            for c in _ASIN_C[-2::-1]:
                p = c + t2 * p
            w = (jnp.pi / 2.0 - cos * p) * (2.0 / jnp.pi)
            w = jnp.where(w < w_threshold, 0.0, w)
        elif w_mode == "sin":
            cos = jnp.clip(cos, 0.0, 1.0)
            # sin(arccos(c)) == sqrt(1 − c²) exactly — no acos needed
            w = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 0.0))
        elif w_mode in ("linear", "threshold"):
            cos = jnp.clip(cos, 0.0, 1.0)
            w = _acos01(cos) * (2.0 / jnp.pi)       # == ang/90
            if w_mode == "threshold":
                w = jnp.where(w < w_threshold, 0.0, w)
        else:
            raise ValueError(f"unknown w_mode {w_mode!r}")
        # leaf parts (leafkeep) use uniform weights
        w = jnp.where(allone > 0, jnp.ones_like(w), w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    valid = (rows != cols) & (rows < n_real) & (cols < n_real)
    w = jnp.where(valid, w, 0.0)
    de = de0 * a
    mask = (w * de) != 0.0
    return w, de, mask


def _fwd_kernel(n_real_ref, allone_ref, a_ref, vp_ref, rp_ref, bone_ref,
                out_ref, *, n_pad: int, w_mode: str, w_threshold: float,
                relat: bool, fast_acos: bool = False):
    i = pl.program_id(0)
    vp = vp_ref[0]                                          # [n_pad, 128]
    rp = rp_ref[0]
    bone = bone_ref[0][0:1, :]                              # [1, 128]
    w, de, mask = _weights_de_mask(vp, bone, n_real_ref[i], allone_ref[i],
                                   a_ref[i], n_pad=n_pad, w_mode=w_mode,
                                   w_threshold=w_threshold,
                                   fast_acos=fast_acos)
    de_r = jnp.where(mask, _pair_dists(rp), 0.0)
    if relat:
        de_safe = jnp.where(mask, de, 1.0)
        term = jnp.abs(w * (de_r / de_safe) - w)
    else:
        term = jnp.abs(w * de_r - w * de)
    term = jnp.where(mask, term, 0.0)
    # scalars land in a full [8, 128] tile: (0,0)=term sum, (0,1)=count
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    tile = jnp.where((rows == 0) & (cols == 0), jnp.sum(term), 0.0)
    tile = jnp.where((rows == 0) & (cols == 1),
                     jnp.sum(mask.astype(jnp.float32)), tile)
    out_ref[0] = tile


def _fwd_grad_kernel(n_real_ref, allone_ref, a_ref, vp_ref, rp_ref,
                     bone_ref, out_ref, g0_ref, *, n_pad: int, w_mode: str,
                     w_threshold: float, relat: bool,
                     fast_acos: bool = False):
    """One-pass variant: forward scalars AND the UNSCALED reconstruction
    gradient g0 = d(term_sum)/d(rp) in a single program.  The gradient is
    linear in the upstream cotangent, so the VJP is g0 * ct — computed
    outside the kernel as one elementwise multiply.  Eliminates the
    backward kernel's full tile recompute (w/de/mask/de_r twice per
    branch) at the cost of writing g0 ([n_pad, 128] f32 per program) to
    HBM: ~20 VPU passes traded for ~3 bytes/element of streaming
    traffic.

    term and g share q = w·(de_r0/de_safe) − w (r5 dedup): the old form
    computed the whole div/mul/sub chain twice — once masked inside |·| for
    term, once unmasked inside sign for g.  On-mask de_r == de_r0 and both
    outputs are masked afterwards, so one q is bit-identical and saves 4
    VPU passes over the tile."""
    i = pl.program_id(0)
    vp = vp_ref[0]
    rp = rp_ref[0]
    bone = bone_ref[0][0:1, :]
    w, de, mask = _weights_de_mask(vp, bone, n_real_ref[i], allone_ref[i],
                                   a_ref[i], n_pad=n_pad, w_mode=w_mode,
                                   w_threshold=w_threshold,
                                   fast_acos=fast_acos)
    de_r0 = _pair_dists(rp)
    if relat:
        de_safe = jnp.where(mask, de, 1.0)
        q = w * (de_r0 / de_safe) - w
        term = jnp.abs(q)
        g = (w / de_safe) * jnp.sign(q)
    else:
        q = w * de_r0 - w * de
        term = jnp.abs(q)
        g = w * jnp.sign(q)
    term = jnp.where(mask, term, 0.0)
    g = jnp.where(mask, g, 0.0)
    coef = jnp.where(de_r0 > 0.0, g / jnp.where(de_r0 > 0.0, de_r0, 1.0),
                     0.0)
    rowsum = jnp.sum(coef, axis=1, keepdims=True)
    mixed = jax.lax.dot_general(
        coef, rp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g0_ref[0] = 2.0 * (rp * rowsum - mixed)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    tile = jnp.where((rows == 0) & (cols == 0), jnp.sum(term), 0.0)
    tile = jnp.where((rows == 0) & (cols == 1),
                     jnp.sum(mask.astype(jnp.float32)), tile)
    out_ref[0] = tile


def _bwd_kernel(n_real_ref, allone_ref, a_ref, ct_ref, vp_ref, rp_ref,
                bone_ref, drp_ref, *, n_pad: int, w_mode: str,
                w_threshold: float, relat: bool, fast_acos: bool = False):
    i = pl.program_id(0)
    vp = vp_ref[0]
    rp = rp_ref[0]
    bone = bone_ref[0][0:1, :]
    w, de, mask = _weights_de_mask(vp, bone, n_real_ref[i], allone_ref[i],
                                   a_ref[i], n_pad=n_pad, w_mode=w_mode,
                                   w_threshold=w_threshold,
                                   fast_acos=fast_acos)
    de_r = _pair_dists(rp)
    if relat:
        de_safe = jnp.where(mask, de, 1.0)
        g = (w / de_safe) * jnp.sign(w * (de_r / de_safe) - w)
    else:
        g = w * jnp.sign(w * de_r - w * de)
    g = jnp.where(mask, g * ct_ref[i], 0.0)
    # d de_r[j,k] / d rp[j] = (rp[j]−rp[k]) / de_r[j,k]; g is symmetric, so
    # d_rp[j] = 2 Σ_k (g/de_r)[j,k] (rp[j]−rp[k])
    coef = jnp.where(de_r > 0.0, g / jnp.where(de_r > 0.0, de_r, 1.0), 0.0)
    rowsum = jnp.sum(coef, axis=1, keepdims=True)           # [n, 1]
    mixed = jax.lax.dot_general(
        coef, rp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [n, 128]
    drp_ref[0] = 2.0 * (rp * rowsum - mixed)


def _expand_scalars(a_stack, n_real, allone, batch):
    n_real_e = jnp.repeat(jnp.asarray(n_real, jnp.int32), batch)
    allone_e = jnp.repeat(jnp.asarray(allone, jnp.int32), batch)
    a_e = jnp.asarray(a_stack, jnp.float32).reshape(-1)     # [P*B]
    return n_real_e, allone_e, a_e


def _tile_specs(n_pad):
    tile = pl.BlockSpec((1, n_pad, _LANES), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    # bone rides an (8, 128) tile per program (Mosaic block shapes must be
    # whole (8, 128) tiles); only row 0 carries data
    bone = pl.BlockSpec((1, 8, _LANES), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return tile, bone


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def part_dist_sums(vp_stack, rp_stack, bone_stack, a_stack, n_real, allone,
                   w_mode: str, w_threshold: float, relat: bool):
    """Fused per-(part, batch) masked distance-term/count sums.

    vp_stack/rp_stack [P*B, n_pad, 128] f32 (xyz in lanes 0-2, zero
    elsewhere; rows past a part's true size arbitrary); bone_stack
    [P*B, 128] (xyz in lanes 0-2); a_stack [P, B] f32; n_real [P] int32;
    allone [P] int32 (1 = uniform weights).  Returns [P*B, 2]:
    (Σ masked term, Σ mask).  Gradients flow to rp_stack only.
    """
    return _fwd_call(vp_stack, rp_stack, bone_stack, a_stack, n_real,
                     allone, w_mode, w_threshold, relat)


def _fwd_call(vp_stack, rp_stack, bone_stack, a_stack, n_real, allone,
              w_mode, w_threshold, relat):
    g, n_pad, _ = vp_stack.shape
    batch = g // n_real.shape[0]
    n_real_e, allone_e, a_e = _expand_scalars(a_stack, n_real, allone, batch)
    tile, bone = _tile_specs(n_pad)
    kern = functools.partial(_fwd_kernel, n_pad=n_pad, w_mode=w_mode,
                             w_threshold=w_threshold, relat=relat,
                             fast_acos=_use_fast_acos(w_mode, w_threshold))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[tile, tile, bone],
            out_specs=pl.BlockSpec((1, 8, _LANES), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((g, 8, _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(n_real_e, allone_e, a_e, vp_stack, rp_stack, bone_stack)
    return out[:, 0, :2]


def _fwd_grad_call(vp_stack, rp_stack, bone_stack, a_stack, n_real, allone,
                   w_mode, w_threshold, relat):
    """One-pass forward: (sums [g, 2], g0 [g, n_pad, 128])."""
    g, n_pad, _ = vp_stack.shape
    batch = g // n_real.shape[0]
    n_real_e, allone_e, a_e = _expand_scalars(a_stack, n_real, allone, batch)
    tile, bone = _tile_specs(n_pad)
    kern = functools.partial(_fwd_grad_kernel, n_pad=n_pad, w_mode=w_mode,
                             w_threshold=w_threshold, relat=relat,
                             fast_acos=_use_fast_acos(w_mode, w_threshold))
    out, g0 = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g,),
            in_specs=[tile, tile, bone],
            out_specs=[
                pl.BlockSpec((1, 8, _LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, _LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((g, 8, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((g, n_pad, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(n_real_e, allone_e, a_e, vp_stack, rp_stack, bone_stack)
    return out[:, 0, :2], g0


def _one_pass_grad() -> bool:
    """VJP strategy: True = the fwd kernel also emits the unscaled gradient
    (no backward recompute); False = the r2 two-kernel design.  The
    one-pass form trades the backward kernel's ~20 VPU passes for streaming
    g0 traffic — CPU-interpret tests prove both paths exact vs the jnp
    formulation either way.  ADOPTED as the default after the r4 on-chip
    A/B (v5e, B=128 full step, back-to-back benches): 549.9 -> 616.3
    meshes/s = -25.1 ms/step, 88% of the derived 28.7 ms prediction
    (benchmarks/dist_loss_roofline.py) and above the 23.9 ms adoption bar.
    SH_TPU_DIST_ONEPASS=0 restores the two-kernel VJP."""
    import os
    return os.environ.get("SH_TPU_DIST_ONEPASS", "1") == "1"


def _vjp_fwd(vp_stack, rp_stack, bone_stack, a_stack, n_real, allone,
             w_mode, w_threshold, relat):
    if _one_pass_grad():
        out, g0 = _fwd_grad_call(vp_stack, rp_stack, bone_stack, a_stack,
                                 n_real, allone, w_mode, w_threshold, relat)
        return out, (g0,)
    out = _fwd_call(vp_stack, rp_stack, bone_stack, a_stack, n_real,
                    allone, w_mode, w_threshold, relat)
    return out, (vp_stack, rp_stack, bone_stack, a_stack, n_real, allone)


def _vjp_bwd(w_mode, w_threshold, relat, res, ct):
    if len(res) == 1:       # one-pass residual: the unscaled gradient
        (g0,) = res
        drp = g0 * ct[:, 0].astype(jnp.float32)[:, None, None]
        return None, drp, None, None, None, None
    vp_stack, rp_stack, bone_stack, a_stack, n_real, allone = res
    g, n_pad, _ = vp_stack.shape
    batch = g // n_real.shape[0]
    n_real_e, allone_e, a_e = _expand_scalars(a_stack, n_real, allone, batch)
    ct_sum = ct[:, 0].astype(jnp.float32)   # the count output carries no grad
    tile, bone = _tile_specs(n_pad)
    kern = functools.partial(_bwd_kernel, n_pad=n_pad, w_mode=w_mode,
                             w_threshold=w_threshold, relat=relat,
                             fast_acos=_use_fast_acos(w_mode, w_threshold))
    drp = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(g,),
            in_specs=[tile, tile, bone],
            out_specs=pl.BlockSpec((1, n_pad, _LANES),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((g, n_pad, _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(n_real_e, allone_e, a_e, ct_sum, vp_stack, rp_stack, bone_stack)
    return None, drp, None, None, None, None


part_dist_sums.defvjp(_vjp_fwd, _vjp_bwd)


# --- high-level wrapper -------------------------------------------------------

# Largest part tile the kernel takes: [n, n] f32 working set must fit VMEM
# with headroom (768² x 4 B = 2.25 MB per live buffer).  Bigger parts fall
# back to the jnp formulation per part (losses.weighted_distance_loss).
MAX_FUSED_N = 768


class PartDistTables:
    """Trace-time constants: parts grouped into equal-n_pad buckets so
    ragged part sizes (DFAUST) don't pay the largest part's quadratic
    padding, plus the oversize spill list."""

    def __init__(self, part_indices, leafkeep: bool, w_mode: str):
        sizes = [len(ix) for ix in part_indices]
        self.n_parts = len(part_indices)
        self.sizes = sizes
        allone = np.zeros(self.n_parts, np.int32)
        if w_mode == "all_one":
            allone[:] = 1
        elif leafkeep:
            allone[list(LEAF_PART_INDICES)] = 1

        by_pad: dict = {}
        self.oversize_ids = []
        for k, n in enumerate(sizes):
            n_pad = _round_up(max(n, 8), 8)
            if n_pad > MAX_FUSED_N:
                self.oversize_ids.append(k)
            else:
                by_pad.setdefault(n_pad, []).append(k)
        self.buckets = []
        self.fused_ids = []            # part ids in kernel output order
        for n_pad in sorted(by_pad):
            ids = by_pad[n_pad]
            idx = np.zeros((len(ids), n_pad), np.int32)
            for row, k in enumerate(ids):
                idx[row, :sizes[k]] = np.asarray(part_indices[k])
            self.buckets.append({
                "n_pad": n_pad,
                "part_ids": ids,
                "idx_flat": idx.reshape(-1),
                "n_real": np.asarray([sizes[k] for k in ids], np.int32),
                "allone": allone[ids],
            })
            self.fused_ids.extend(ids)


def _stack_parts(verts, idx_flat, n_parts, n_pad):
    """[B, V, 3] -> [P*B, n_pad, 128] f32, xyz in lanes 0-2."""
    b = verts.shape[0]
    g = jnp.take(verts, jnp.asarray(idx_flat), axis=1)      # [B, P*n_pad, 3]
    g = g.reshape(b, n_parts, n_pad, 3).transpose(1, 0, 2, 3)
    g = g.reshape(n_parts * b, n_pad, 3).astype(jnp.float32)
    return jnp.pad(g, ((0, 0), (0, 0), (0, _LANES - 3)))


def fused_part_sums(tx_nodummy, rec_nodummy, bones, tables: PartDistTables,
                    a_full=None, w_mode: str = "threshold",
                    w_threshold: float = 0.8, relat: bool = True):
    """(term_sums, counts), each [len(tables.fused_ids)] in fused_ids order,
    matching the jnp path's per-part Σ(masked term) / Σ mask.  bones
    [B, P, 3] per-part orientation vectors.  One kernel launch per size
    bucket."""
    b = tx_nodummy.shape[0]
    outs = []
    for bk in tables.buckets:
        ids = bk["part_ids"]
        pc = len(ids)
        n_pad = bk["n_pad"]
        vp = _stack_parts(tx_nodummy, bk["idx_flat"], pc, n_pad)
        rp = _stack_parts(rec_nodummy, bk["idx_flat"], pc, n_pad)
        ids_j = jnp.asarray(np.asarray(ids, np.int32))
        bone = jnp.take(bones, ids_j, axis=1)               # [B, pc, 3]
        bone = jnp.transpose(bone, (1, 0, 2)).reshape(pc * b, 3)
        bone = jnp.pad(bone.astype(jnp.float32), ((0, 0), (0, _LANES - 3)))
        bone = jnp.pad(bone[:, None, :], ((0, 0), (0, 7), (0, 0)))
        if a_full is None:
            a = jnp.ones((pc, b), jnp.float32)
        else:
            a = jnp.transpose(jnp.take(a_full, ids_j, axis=1))
        sums = part_dist_sums(vp, rp, bone, a.astype(jnp.float32),
                              bk["n_real"], bk["allone"],
                              w_mode, w_threshold, relat)   # [pc*B, 2]
        outs.append(sums.reshape(pc, b, 2).sum(axis=1))
    sums = jnp.concatenate(outs, axis=0)
    return sums[:, 0], sums[:, 1]


_PROBE_CACHE: dict[int, bool] = {}


def bucket_n_pads(part_indices) -> tuple[int, ...]:
    """The distinct fused-kernel tile heights the wrapper will launch for
    these parts (sorted; oversize parts excluded — they take the jnp
    path)."""
    pads = {_round_up(max(len(ix), 8), 8) for ix in part_indices}
    return tuple(sorted(p for p in pads if p <= MAX_FUSED_N))


def _probe_one(n: int) -> bool:
    """Does Mosaic compile AND differentiate the kernel at tile height n on
    the current default backend?  (On CPU the non-interpret pallas_call
    fails and the jnp path is used.)

    The body is explicitly jitted and executed: an eager pallas_call
    evaluated while an outer jit is tracing DEFERS its lowering error to
    the outer compile, which would make a bare probe report success on
    backends that cannot run the kernel.
    """
    if n in _PROBE_CACHE:
        return _PROBE_CACHE[n]
    try:
        vp = jnp.zeros((2, n, _LANES), jnp.float32)
        bone = jnp.ones((2, 8, _LANES), jnp.float32)
        a = jnp.ones((2, 1), jnp.float32)
        n_real = np.asarray([max(n - 3, 1), max(n - 3, 1)], np.int32)
        allone = np.asarray([0, 1], np.int32)

        def f(rp):
            return jnp.sum(part_dist_sums(vp, rp, bone, a, n_real, allone,
                                          "threshold", 0.8, True)[:, 0])

        jax.block_until_ready(jax.jit(jax.grad(f))(vp + 1.0))
        _PROBE_CACHE[n] = True
    except Exception:
        _PROBE_CACHE[n] = False
    return _PROBE_CACHE[n]


def fused_dist_available(n_pads=None) -> bool:
    """True iff Mosaic compiles AND differentiates the fused kernel at
    EVERY tile size in `n_pads` (cached per size per process).

    Mosaic compile failures are shape-specific (lane layouts, tiny tiles),
    not just VMEM-capacity-bound, so a single largest-tile probe cannot
    certify the small buckets — callers pass the ACTUAL bucket sizes their
    PartDistTables will launch (`bucket_n_pads`).  Default: the largest
    supported tile only (capacity smoke check)."""
    if n_pads is None:
        n_pads = (MAX_FUSED_N,)
    return all(_probe_one(int(n)) for n in n_pads)
