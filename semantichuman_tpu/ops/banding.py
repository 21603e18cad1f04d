"""Block-banded spiral-gather tables.

The r3 one-hot adoption (ops/spiral_conv.py:spiral_conv_onehot) converts
the spiral gather's batch-independent ~100 ns/row floor into MXU matmuls,
but its [V1*S, V1] selection matrix makes FLOPs grow with V1^2*S — it was
measured and REJECTED at the two fine levels (L0 0.76x, L1 1.16x) and at
large batch (benchmarks/coarse_trunk_probe.py).

Spiral tables are however LOCAL: on the production topology 97%+ of
non-dummy indices lie within a narrow band of their center vertex
(block R=256 / window W=768 leaves ~2.4% of entries out-of-band at both
fine levels).  A BLOCK-BANDED one-hot cuts the matmul's K dimension from
V1 to W (a V1/W ~ 5-9x FLOP cut), keeps the backward a transposed matmul
instead of a scatter-add over V1*S rows, and handles the out-of-band tail
with an exact sparse fixup (gather + at[].add; VJP = scatter over ~2.4%
of the rows).  Dummy pads (33% of L0 entries) hit no band column and
contribute an exact zero — in the take form each pad costs a gather row.

This module builds the small host-side spec (window starts + fixup lists;
~10 KB).  The selection tensor itself is built ON THE FLY inside the trace
(iota-compare, ops/spiral_conv.py:spiral_conv_banded): resident one-hot
tables measured no faster than on-the-fly construction and a [nblk, R*S, W]
bf16 constant (~160 MB at L0) cannot ship as a jit closure on the remote
platform (HTTP 413 — docs/BENCHMARKS.md, axon timing/transport notes).

Reference anchor: the gather this reformulates is models.py:40-42
(torch.index_select over the spiral table).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# (block rows, window cols) presets, tried in order; a level adopts the
# first preset whose out-of-band fraction is acceptable.  W must be a
# multiple of 128 (MXU lane width); R*S should comfortably exceed 8 rows.
# The window must cover the block's SOURCE span: spiral rows read their
# own level (span ~R), unpool rows read the next-coarser level (span
# ~R/2), pool rows read the next-finer level (span ~2R) — hence the
# per-table shapes (measured on the production topology: spiral 2.3-2.5%
# out-of-band, unpool ~1%, pool 0%).
BAND_PRESETS = ((256, 768), (512, 1024))
UNPOOL_BAND_PRESETS = ((256, 512), (512, 768))
POOL_BAND_PRESETS = ((128, 384), (256, 768))
MAX_OOB_FRAC = 0.05


@dataclass(frozen=True)
class DiagBandSpec:
    """Block-DIAGONAL banding for the Pallas fused gather kernel
    (ops/pallas/banded_gather_pallas.py) — the r5 successor to the XLA
    banded form's arbitrary-offset windows.

    The XLA form extracts one W-row window per block at an arbitrary
    (median-centered) start; a Pallas BlockSpec cannot express arbitrary
    offsets, so here the window is K aligned R-row source BLOCKS starting
    at block index `base[n]` (monotone, clipped).  K·R ≥ W, so coverage is
    a superset of the XLA band's and out-of-band fixups can only shrink.

    rel[n, r·S+s] = sp[n·R+r, s] − base[n]·R in [0, K·R), or −1 (sentinel:
    matches no compare column — dummy pads and out-of-range entries).
    Backward: source block q receives contributions from destination
    blocks n with base[n] ≤ q < base[n]+K — a contiguous run because base
    is monotone; bw_n/bw_k list them padded to a fixed width L with the
    sentinel destination block `nblk` (the caller pads the cotangent with
    one zero block).
    """
    base: np.ndarray      # [nblk] int32, block units, ≥ 0 (source pre-padded)
    rel: np.ndarray       # [nblk, R*S] int32, −1 sentinel
    bw_n: np.ndarray      # [n_src_blocks, L] int32 (nblk = zero-pad block)
    bw_k: np.ndarray      # [n_src_blocks, L] int32
    fix_pos: np.ndarray   # flat v*S+s positions out of the diagonal window
    fix_src: np.ndarray
    R: int
    K: int
    S: int
    n_rows: int           # true output rows (V1*S)
    n_src: int            # true source rows (pre-padding)
    oob_frac: float

    @property
    def nblk(self) -> int:
        return len(self.base)

    @property
    def n_src_blocks(self) -> int:
        return self.bw_n.shape[0]


def build_diag_spec(index_table: np.ndarray, R: int, K: int,
                    dummy: int | None = None) -> DiagBandSpec:
    """[N, S] dummy-resolved index table -> DiagBandSpec for (R, K).

    The source is addressed in R-row blocks AFTER a front padding of K
    blocks (so base can sit below 0 in raw coordinates); the kernel caller
    pads the source the same way (ops/pallas/banded_gather_pallas.py)."""
    sp = np.asarray(index_table)
    n, s = sp.shape
    if dummy is None:
        dummy = int(sp.max())
    nblk = (n + R - 1) // R
    base = np.empty(nblk, np.int64)
    for b in range(nblk):
        blk = sp[b * R:(b + 1) * R]
        real = blk[blk != dummy]
        center = int(np.median(real)) if real.size else b * R + R // 2
        base[b] = int(np.floor(center / R)) - K // 2
    # monotone (required for the contiguous backward runs) + front-pad shift
    base = np.maximum.accumulate(base) + K
    sp_pad = np.full((nblk * R, s), -1, np.int64)
    sp_pad[:n] = sp
    rel = sp_pad.reshape(nblk, R, s) + K * R - base[:, None, None] * R
    hit = (rel >= 0) & (rel < K * R) & (sp_pad.reshape(nblk, R, s) >= 0)
    rel = np.where(hit, rel, -1).astype(np.int32).reshape(nblk, R * s)
    miss = ~hit[:len(sp_pad) // R].reshape(nblk * R, s)[:n] \
        & (sp != dummy)
    miss_v, miss_s = np.nonzero(miss)
    fix_pos = (miss_v * s + miss_s).astype(np.int32)
    fix_src = sp[miss_v, miss_s].astype(np.int32)
    pad = (-len(fix_pos)) % 8
    fix_pos = np.concatenate([fix_pos, np.zeros(pad, np.int32)])
    fix_src = np.concatenate([fix_src, np.full(pad, dummy, np.int32)])
    # backward: source block q (in the padded space) <- destinations
    n_src = dummy + 1
    n_src_blocks = (n_src + R - 1) // R + 2 * K   # padded source space
    runs = [[] for _ in range(n_src_blocks)]
    for nb in range(nblk):
        for k in range(K):
            q = int(base[nb]) + k
            if 0 <= q < n_src_blocks:
                runs[q].append((nb, k))
    L = max(1, max(len(r) for r in runs))
    bw_n = np.full((n_src_blocks, L), nblk, np.int32)   # sentinel block
    bw_k = np.zeros((n_src_blocks, L), np.int32)
    for q, r in enumerate(runs):
        for j, (nb, k) in enumerate(r):
            bw_n[q, j] = nb
            bw_k[q, j] = k
    return DiagBandSpec(base=base.astype(np.int32), rel=rel, bw_n=bw_n,
                        bw_k=bw_k, fix_pos=fix_pos, fix_src=fix_src,
                        R=R, K=K, S=s, n_rows=n * s, n_src=n_src,
                        oob_frac=len(miss_v) / sp.size)


@dataclass(frozen=True)
class BandSpec:
    """Static banding spec for one level's index table ([N, S] rows of
    source indices — the spiral table, unpool_idx, or pool_idx[:, None]).

    starts:  per-block window start row in the W-padded input (python ints,
             static so window extraction lowers to static slices)
    fix_pos: [nfix] int32 — flat v*S+s positions whose index is out-of-band
    fix_src: [nfix] int32 — source row for each fixup position
    Fixup arrays are padded to a multiple of 8 with (pos=0, src=dummy).
    The padded adds are exact no-ops ONLY because the dummy SOURCE row is
    zero by construction — weighted consumers (unpool) look up a real,
    generally nonzero weight for the padded position, and it multiplies
    the zero dummy row.  A banded op over a source whose dummy row is not
    structurally zero must not reuse these pads.
    """
    starts: tuple
    fix_pos: np.ndarray
    fix_src: np.ndarray
    R: int
    W: int
    oob_frac: float
    # the Pallas block-diagonal companion (same table, K*R >= W window);
    # None when the geometry can't build one — consumers fall back to the
    # XLA banded form
    diag: DiagBandSpec | None = None

    @property
    def nblk(self) -> int:
        return len(self.starts)


def build_band_spec(index_table: np.ndarray, R: int, W: int,
                    dummy: int | None = None) -> BandSpec:
    """[N, S] dummy-resolved index table -> BandSpec for (R, W).

    `dummy` is the index of the (zero) dummy SOURCE row — the table's own
    row count minus one for the spiral table, the coarse/fine dummy for
    unpool/pool tables.  Dummy references hit no band column and need no
    fixup: gathering a zero row contributes an exact zero either way."""
    sp = np.asarray(index_table)
    v1, s = sp.shape
    if dummy is None:
        dummy = v1 - 1
    nblk = (v1 + R - 1) // R
    # per-block DATA-DRIVEN window placement (median of the block's
    # non-dummy source indices): row space and source space need not be
    # the same scale (unpool reads a level half its own size), and medians
    # also absorb topology-specific index drift.
    # +W: the input is padded by W zero rows on each side, so every window
    # start is non-negative and every window end is in range
    starts = []
    for n in range(nblk):
        blk = sp[n * R:(n + 1) * R]
        real = blk[blk != dummy]
        center = int(np.median(real)) if real.size else n * R + R // 2
        starts.append(center - W // 2 + W)
    starts = tuple(starts)
    rel = sp + W - np.asarray(starts, np.int64)[np.arange(v1) // R][:, None]
    hit = (rel >= 0) & (rel < W)
    miss_v, miss_s = np.nonzero(~hit & (sp != dummy))
    fix_pos = (miss_v * s + miss_s).astype(np.int32)
    fix_src = sp[miss_v, miss_s].astype(np.int32)
    pad = (-len(fix_pos)) % 8
    fix_pos = np.concatenate([fix_pos, np.zeros(pad, np.int32)])
    fix_src = np.concatenate([fix_src, np.full(pad, dummy, np.int32)])
    return BandSpec(starts=starts, fix_pos=fix_pos, fix_src=fix_src,
                    R=R, W=W, oob_frac=len(miss_v) / sp.size)


def banded_apply(xp, u_blocks, band: BandSpec, n_rows: int):
    """Apply a block-banded operator on device: xp [V_src, B*C] (unpadded),
    u_blocks [nblk, R*S', W] -> [n_rows, B*C] (rows beyond the blocks'
    coverage sliced off).  The single shared structure under the banded
    conv/pool/unpool forms: pad the source by W rows each side, extract
    one static window per block, contract windows against the band."""
    import jax
    import jax.numpy as jnp

    w_, nblk = band.W, band.nblk
    xpad = jnp.pad(xp, ((w_, w_), (0, 0)))
    win = jnp.stack([jax.lax.dynamic_slice_in_dim(xpad, st, w_)
                     for st in band.starts])             # [nblk, W, B*C]
    y = jnp.einsum("nrw,nwc->nrc", u_blocks, win,
                   preferred_element_type=xp.dtype)
    return y.reshape(nblk * u_blocks.shape[1], -1)[:n_rows]


def pick_band_spec(index_table: np.ndarray,
                   presets=None,
                   max_oob: float | None = None,
                   dummy: int | None = None) -> BandSpec | None:
    """First preset whose out-of-band fraction is acceptable, else None
    (a topology with no index locality keeps the gather path).  Defaults
    resolve at CALL time so the module constants stay patchable."""
    if presets is None:
        presets = BAND_PRESETS
    if max_oob is None:
        max_oob = MAX_OOB_FRAC
    for R, W in presets:
        spec = build_band_spec(index_table, R, W, dummy=dummy)
        if spec.oob_frac <= max_oob:
            try:
                from dataclasses import replace
                diag = build_diag_spec(np.asarray(index_table), R,
                                       W // R + 1, dummy=dummy)
                spec = replace(spec, diag=diag)
            except Exception:
                pass        # diag companion is best-effort; XLA band stands
            return spec
    return None
