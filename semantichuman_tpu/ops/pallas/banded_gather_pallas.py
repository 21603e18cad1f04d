"""Fused Pallas kernel for the block-diagonal banded spiral gather.

STATUS (r5): measured and REJECTED — the production gate
(spiral_conv._banded_pallas_ok) defaults OFF and nothing routes here
unless SH_TPU_BANDED_PALLAS=1.  On-chip at the paper-recipe concat batch
(B=12, v5e, `SH_TPU_PROBE_PALLAS=1 benchmarks/banded_gather_probe.py`,
results/r5_tpu/diag_probe_b12.out) this kernel runs 0.80-0.87x the XLA
banded form on every fine-level conv cell (L0 3->16: 1.52 vs 1.22 ms;
L0 16->16: 4.79 vs 3.98; L1 16->32: 2.16 vs 1.79; L1 32->32: 2.42 vs
2.11; all errs 0.0) — the hypothesis that the XLA form's on-the-fly
selection build + HBM materialization dominates at SMALL batch is
refuted (that finding was specific to B>=128, where this kernel's own
MXU arithmetic also caps it at <=1.6x of take even at peak, so no batch
regime adopts it).  Kept with its exactness tests
(tests/test_banded_pallas.py) as the reproducible record.

The idea: the XLA banded form (ops/banding.py:banded_apply, adopted r4 at
small batch) materializes its [nblk, R*S, W] selection tensor in HBM
every call; this kernel builds each selection tile IN VMEM from the
compact [nblk, R*S] local-offset table and contracts it on the MXU — the
selection tensor never exists in HBM, in either direction.

Block-diagonal formulation (ops/banding.py:DiagBandSpec): destination
block n reads K aligned R-row source blocks starting at block base[n]
(scalar-prefetched, so the x BlockSpec index maps stay data-driven without
dynamic slices).  One compare orientation serves both directions:

    Dt[j, p] = (rel[n][p] == j + k*R)      # [R, rows] built on the VPU

    fwd:  g_blk(n)[p, m]  = sum_k dot(Dt_k, x_blk(base[n]+k)) lhs-contract 0
    bwd:  dx_blk(q)[j, m] = sum_l dot(Dt(bw_n[q,l], bw_k[q,l]), ct_blk)
                                                              lhs-contract 1

rel rides as a [1, rows] lane-major row so the compare broadcasts along
sublanes — no relayout.  The ~1-2% out-of-band tail is fixed up exactly
OUTSIDE the kernel by the same sparse gather+add the XLA band uses; the
sentinel rel = -1 matches no column and contributes an exact zero (dummy
pads included), so the forward is bit-identical to the take path for the
same reason the XLA band is (each output row sums exactly one product of
a 1.0; MXU operand truncation is idempotent through the consuming conv
matmul).  The backward accumulates its <= L block contributions in f32
per h-piece and casts once per piece — same rounding class as the XLA
band's window adds.

Reference anchor: the gather this reformulates is models.py:40-42
(torch.index_select over the spiral table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_INTERPRET = False  # tests flip this on CPU

# VMEM budget for the persistent diagonal-tile scratch (n_tiles stacked
# [R, rows/h] buffers); the rest of the working set (x/ct blocks, out
# block, double buffers) stays well under the remaining ~10 MB
_DT_SCRATCH_BYTES = 4 * 1024 * 1024


def _h_split(rows: int, R: int, n_tiles: int, itemsize: int) -> int:
    """How many lane-aligned pieces to split R*S rows into so the
    persistent Dt scratch fits its budget."""
    h = 1
    while (n_tiles * R * (rows // h) * itemsize > _DT_SCRATCH_BYTES
           and (rows // (h * 2)) % _LANES == 0):
        h *= 2
    return h


def _build_dt(rel_row, k, R: int, rows: int, dtype):
    """rel_row [1, rows] local offsets -> Dt [R, rows] one-hot for
    diagonal k (k may be a traced scalar)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (R, rows), 0) + k * R
    return (rel_row == j).astype(dtype)


def _fwd_kernel(base_ref, rel_ref, *refs, R: int, K: int, rows_h: int,
                weighted: bool):
    # refs: ([w], x_0..x_{K-1}, out, dt_scratch)
    if weighted:
        w_ref, x_refs = refs[0], refs[1:1 + K]
        out_ref, dt_ref = refs[1 + K], refs[2 + K]
    else:
        w_ref, x_refs = None, refs[:K]
        out_ref, dt_ref = refs[K], refs[K + 1]
    m = pl.program_id(2)

    # the K diagonal tiles depend only on (n, h): build once, reuse for
    # every m-tile — the build cost is batch-independent (the whole point
    # vs the XLA band, whose selection tensor is rebuilt/streamed per use)
    @pl.when(m == 0)
    def _():
        rel_row = rel_ref[0]                            # [1, rows_h]
        for k in range(K):
            dt = _build_dt(rel_row, k, R, rows_h, dt_ref.dtype)
            if weighted:
                dt = dt * w_ref[0].astype(dt.dtype)
            dt_ref[k] = dt

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):
        x_k = x_refs[k][...]
        acc = acc + jax.lax.dot_general(
            dt_ref[k].astype(x_k.dtype), x_k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _bwd_kernel(bwn_ref, bwk_ref, *refs, R: int, L: int, rows_h: int,
                weighted: bool):
    # refs: (rel_0..rel_{L-1}, [w_0..w_{L-1}], ct_0..ct_{L-1}, out, dt)
    q = pl.program_id(0)
    m = pl.program_id(2)
    rel_refs = refs[:L]
    if weighted:
        w_refs = refs[L:2 * L]
        ct_refs = refs[2 * L:3 * L]
        out_ref, dt_ref = refs[3 * L], refs[3 * L + 1]
    else:
        w_refs = (None,) * L
        ct_refs = refs[L:2 * L]
        out_ref, dt_ref = refs[2 * L], refs[2 * L + 1]

    @pl.when(m == 0)
    def _():
        for l in range(L):
            dt = _build_dt(rel_refs[l][0], bwk_ref[q, l], R, rows_h,
                           dt_ref.dtype)
            if weighted:
                dt = dt * w_refs[l][0].astype(dt.dtype)
            dt_ref[l] = dt

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for l in range(L):
        ct_l = ct_refs[l][0]
        acc = acc + jax.lax.dot_general(
            dt_ref[l].astype(ct_l.dtype), ct_l, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # each h-piece writes its own [nq*R, M] plane (summed by the caller):
    # with m innermost the (q, m) block would be revisited NON-consecutively
    # across h, which the pipeline does not allow
    out_ref[...] = acc[None].astype(out_ref.dtype)


def _pad_rows(a, rows: int):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _dt_dtype(x_dtype, weighted: bool):
    """Scratch dtype for the persistent selection tiles.  Unweighted tiles
    hold only 0/1 — exact in bf16 at half the VMEM (the binding resource:
    the L0 bwd scratch is L x [R, 1920] and 3840 rows only lane-split in
    half).  Weighted tiles match the XLA band's G dtype (x.dtype), so the
    folded weights round identically to `unpool_banded`'s selection
    tensor."""
    if not weighted:
        return jnp.bfloat16
    return x_dtype


def _common(spec, M, m_tile, n_tiles, itemsize):
    rows = spec.R * spec.S
    h = _h_split(rows, spec.R, n_tiles, itemsize)
    rows_h = rows // h
    m_pad = -(-M // m_tile) * m_tile
    return rows, h, rows_h, m_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def diag_banded_gather(xp, weights, spec, m_tile: int = _LANES):
    """xp [n_src, M] -> g [spec.n_rows, M]: the flat [N*S, M] gather,
    optionally weighted per flat row (`weights` None or a trace-time
    [nblk, R*S] f32 constant; gradients flow to xp only).  Out-of-band
    rows are NOT fixed up here — callers apply the exact sparse fixup
    (spec.fix_pos/fix_src) outside, exactly as the XLA band does."""
    return _fwd_call(xp, weights, spec, m_tile)


def _fwd_call(xp, weights, spec, m_tile):
    R, K, nblk = spec.R, spec.K, spec.nblk
    M = xp.shape[1]
    dt_dtype = _dt_dtype(xp.dtype, weights is not None)
    rows, h, rows_h, m_pad = _common(spec, M, m_tile, K,
                                     jnp.dtype(dt_dtype).itemsize)
    xpad = _pad_rows(jnp.pad(xp, ((K * R, 0), (0, 0))),
                     spec.n_src_blocks * R)
    if m_pad != M:
        xpad = jnp.pad(xpad, ((0, 0), (0, m_pad - M)))
    rel = jnp.asarray(spec.rel).reshape(nblk * h, 1, rows_h)
    base = jnp.asarray(spec.base)
    grid = (nblk, h, m_pad // m_tile)   # m innermost: the Dt scratch is
    # rebuilt only when (n, h) changes — build cost batch-independent
    row_spec = pl.BlockSpec((1, 1, rows_h),
                            lambda n, hh, m, b: (n * h + hh, 0, 0),
                            memory_space=pltpu.VMEM)
    x_specs = [pl.BlockSpec((R, m_tile),
                            functools.partial(
                                lambda n, hh, m, b, kk: (b[n] + kk, m),
                                kk=k),
                            memory_space=pltpu.VMEM)
               for k in range(K)]
    out_spec = pl.BlockSpec((rows_h, m_tile),
                            lambda n, hh, m, b: (n * h + hh, m),
                            memory_space=pltpu.VMEM)
    w_in, w_specs = [], []
    if weights is not None:
        w_in = [jnp.asarray(weights, jnp.float32).reshape(
            nblk * h, 1, rows_h)]
        w_specs = [row_spec]
    kern = functools.partial(_fwd_kernel, R=R, K=K, rows_h=rows_h,
                             weighted=weights is not None)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[row_spec] + w_specs + x_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((K, R, rows_h), dt_dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * rows, m_pad), xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(base, rel, *w_in, *([xpad] * K))
    return out[:spec.n_rows, :M]


def _bwd_call(ct, weights, spec, m_tile):
    R, K, nblk = spec.R, spec.K, spec.nblk
    L = spec.bw_n.shape[1]
    M = ct.shape[1]
    dt_dtype = _dt_dtype(ct.dtype, weights is not None)
    rows, h, rows_h, m_pad = _common(spec, M, m_tile, L,
                                     jnp.dtype(dt_dtype).itemsize)
    # pad ct to full blocks + ONE zero sentinel block (bw_n == nblk)
    ctp = _pad_rows(ct, (nblk + 1) * rows)
    if m_pad != M:
        ctp = jnp.pad(ctp, ((0, 0), (0, m_pad - M)))
    ctp = ctp.reshape((nblk + 1) * h, rows_h, m_pad)
    relp = jnp.concatenate(
        [jnp.asarray(spec.rel),
         jnp.full((1, rows), -1, jnp.int32)]).reshape(
             (nblk + 1) * h, 1, rows_h)
    nq = spec.n_src_blocks
    grid = (nq, h, m_pad // m_tile)   # m innermost (scratch reuse);
    # each h-piece writes its own output plane, summed below

    def row_map(l):
        return lambda q, hh, m, n_, k_: (n_[q, l] * h + hh, 0, 0)

    def ct_map(l):
        return lambda q, hh, m, n_, k_: (n_[q, l] * h + hh, 0, m)

    rel_specs = [pl.BlockSpec((1, 1, rows_h), row_map(l),
                              memory_space=pltpu.VMEM) for l in range(L)]
    ct_specs = [pl.BlockSpec((1, rows_h, m_tile), ct_map(l),
                             memory_space=pltpu.VMEM) for l in range(L)]
    w_in, w_specs = [], []
    if weights is not None:
        wp = jnp.concatenate(
            [jnp.asarray(weights, jnp.float32).reshape(nblk, rows),
             jnp.zeros((1, rows), jnp.float32)]).reshape(
                 (nblk + 1) * h, 1, rows_h)
        w_in = [wp] * L
        w_specs = [pl.BlockSpec((1, 1, rows_h), row_map(l),
                                memory_space=pltpu.VMEM) for l in range(L)]
    kern = functools.partial(_bwd_kernel, R=R, L=L, rows_h=rows_h,
                             weighted=weights is not None)
    out_spec = pl.BlockSpec((1, R, m_tile),
                            lambda q, hh, m, n_, k_: (hh, q, m),
                            memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=rel_specs + w_specs + ct_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((L, R, rows_h), dt_dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((h, nq * R, m_pad), ct.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_INTERPRET,
    )(jnp.asarray(spec.bw_n), jnp.asarray(spec.bw_k),
      *([relp] * L), *w_in, *([ctp] * L))
    dx = dx[0] if h == 1 else jnp.sum(dx, axis=0, dtype=jnp.float32).astype(
        ct.dtype)
    # un-pad: drop the K front source blocks and the tail
    return dx[K * R:K * R + spec.n_src, :M]


def _vjp_fwd(xp, weights, spec, m_tile):
    return _fwd_call(xp, weights, spec, m_tile), weights


def _vjp_bwd(spec, m_tile, weights, ct):
    return _bwd_call(ct, weights, spec, m_tile), None


diag_banded_gather.defvjp(_vjp_fwd, _vjp_bwd)


_PROBE_CACHE: dict = {}


def diag_gather_available(spec) -> bool:
    """Does Mosaic compile AND differentiate the kernel for this spec's
    tile geometry on the current default backend?  Keyed per
    (R, K, S, L, backend) — Mosaic failures are shape-specific.  The probe
    jits and EXECUTES a miniature same-geometry instance (an eager
    pallas_call traced inside an outer jit defers its lowering error, so a
    bare trace would misreport — same rationale as
    part_dist_pallas._probe_one)."""
    key = (spec.R, spec.K, spec.S, spec.bw_n.shape[1],
           jax.default_backend())
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    try:
        from ..banding import build_diag_spec
        rng = np.random.default_rng(0)
        n = 3 * spec.R + 5
        tbl = np.minimum(
            np.arange(n)[:, None] + rng.integers(0, 64, (n, spec.S)),
            n - 1).astype(np.int32)
        small = build_diag_spec(tbl, spec.R, spec.K, dummy=n - 1)
        xp = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)

        def f(x):
            return jnp.sum(diag_banded_gather(x, None, small, _LANES))

        jax.block_until_ready(jax.jit(jax.grad(f))(xp))
        _PROBE_CACHE[key] = True
    except Exception:
        _PROBE_CACHE[key] = False
    return _PROBE_CACHE[key]
