"""Derive the gather/scatter roofline of the B=128 training step.

VERDICT r3 weak #3: the claim "556.8 meshes/s is near the platform bound"
was asserted from a ~100 ns/row folk number but never DERIVED.  This script
derives it: it traces the exact production step (same construction as
bench.py — full topology, bf16 trunk, every loss branch, exc_variant=ori)
with instrumented conv/pool/unpool entry points, inventories every gathered
and scattered row and byte, and computes the implied step-time floor under
the measured two-regime gather model:

    t_op >= max(bytes_moved / BW_EFF,  rows * T_ISSUE)

The two calibration constants are MEASURED on the v5e (docs/BENCHMARKS.md):
  * T_ISSUE ~ 100 ns/row — the per-descriptor issue floor, binding when
    rows are NARROW (small batch: r2 measured 10.07-10.21 ms for the
    103,395-row L0 conv gather/scatter at f32; the r2 Pallas DMA probe
    measured the same ~96 ns/descriptor independently);
  * BW_EFF ~ 120-160 GB/s — the gather engine's effective bandwidth,
    binding when rows are WIDE (B=128: the r1 847 MB L0 f32 gather read
    at 85-120 GB/s packed / ~160 GB/s best measured — far below the
    819 GB/s streaming peak, which XLA gathers never approach).

Row counting convention (matches the r2/r3 probe bookkeeping): one row per
gather/scatter DESCRIPTOR, i.e. per (vertex, spiral-slot) table entry —
batch and channels ride inside the row, which is what makes small-batch
steps nearly as expensive as large-batch ones.

Runs entirely on CPU (tracing only — no execution, no chip needed):

    python benchmarks/row_floor_roofline.py [--batch 128] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1").strip()

import numpy as np  # noqa: E402

# calibration constants (measured, see module docstring)
T_ISSUE_NS = 100.0
BW_EFF_GBS = 160.0          # best measured gather bandwidth (optimistic)
BW_EFF_GBS_TYP = 120.0      # typical measured (production layout)

# measured non-trunk piece times at B=128 (docs/BENCHMARKS.md "Step
# composition"): the weighted-distance losses are VPU-compute-bound and
# the part-volume loss is small; neither moves spiral rows.  The loss
# term is keyed on the shipped one-pass-VJP gate (SH_TPU_DIST_ONEPASS,
# default on): two-kernel measured 72.9 ms; one-pass = 72.9 minus the
# r4 on-chip A/B's -25.1 ms/step (232.8 -> 207.7 ms back-to-back benches,
# docs/BENCHMARKS.md "One-pass distance-loss VJP").
MEASURED_LOSS_MS_TWO_KERNEL = 72.9
MEASURED_LOSS_MS_ONE_PASS = 47.8
# r5 pass-reduction levers (q-dedup + threshold acos fast path,
# SH_TPU_DIST_FASTACOS default on) + staged GT loss inputs: measured
# directly on the shipped tree by the flag-toggle breakdown
# (benchmarks/step_breakdown.py --batch 128 --iters 20,
# results/r5_tpu/b128_breakdown_final.out: dist_loss_ms 37.9 — the
# back-to-back A/B arithmetic's 43.3 was pre-GT-staging and carried the
# stale 3.1 vol term)
MEASURED_LOSS_MS_ONE_PASS_FAST = 37.9
if os.environ.get("SH_TPU_DIST_ONEPASS", "1") == "0":
    MEASURED_LOSS_MS = MEASURED_LOSS_MS_TWO_KERNEL
elif os.environ.get("SH_TPU_DIST_FASTACOS", "1") == "0":
    MEASURED_LOSS_MS = MEASURED_LOSS_MS_ONE_PASS
else:
    MEASURED_LOSS_MS = MEASURED_LOSS_MS_ONE_PASS_FAST
# part-volume loss, same toggle methodology, same run (was 3.1 pre-GT-staging)
MEASURED_VOL_MS = 2.7
# bench.py roofline: 5.43 GFLOP/mesh; v5e bf16 peak 197 TFLOP/s
GFLOP_PER_MESH = 5.43
PEAK_TFLOPS = 197.0

STEP_MS_ACHIEVED = {
    128: 1000.0 * 128 / 642.0,   # r5 session headline
                                 # (results/r5_tpu/bench_gt.out; r4 driver
                                 # capture: 625.0, BENCH_r04.json)
    64: 1000.0 * 64 / 444.56,    # r4 bench sweep
    256: 1000.0 * 256 / 556.1,   # r4 bench sweep
    4: 1800.0 / 64,              # paper recipe: 1.8 s/epoch / 64 steps, r5
                                 # shipped (staged GT + batched metric fetch,
                                 # results/r5_tpu/epoch_probe_gt.out); the
                                 # isolated chained step is 24.1 ms — the
                                 # ~4 ms delta is recorded scan machinery
                                 # (docs/BENCHMARKS.md epoch attribution)
}


def _install_counters(records: list):
    """Wrap the dispatcher entry points the model trunks call, recording
    (kind, v1, rows, gathered bytes, dtype) per call.  Patching happens
    BEFORE model construction so the factory captures the wrappers."""
    import importlib

    import semantichuman_tpu.models.common as common
    sconv = importlib.import_module("semantichuman_tpu.ops.spiral_conv")
    sampling = importlib.import_module("semantichuman_tpu.ops.sampling")

    orig_conv, orig_pool, orig_unpool = (sconv.spiral_conv, sampling.pool,
                                         sampling.unpool)

    def conv(x, spiral_idx, w, bias, activation="elu", compute_dtype=None,
             band=None):
        b, _, c = x.shape
        v1, s = spiral_idx.shape
        itemsize = np.dtype(compute_dtype or x.dtype).itemsize
        records.append(dict(kind="conv", v1=int(v1), s=int(s),
                            rows=int(v1) * int(s), c=int(c),
                            bc=int(b) * int(c), src1=int(v1),
                            bytes_per_row=int(b) * int(c) * itemsize))
        return orig_conv(x, spiral_idx, w, bias, activation, compute_dtype,
                         band=band)

    def pool(x, pool_idx, band=None):
        b, src1, c = x.shape
        rows = int(pool_idx.shape[0])
        itemsize = np.dtype(x.dtype).itemsize
        records.append(dict(kind="pool", v1=rows, s=1, rows=rows, c=int(c),
                            bc=int(b) * int(c), src1=int(src1),
                            bytes_per_row=int(b) * int(c) * itemsize))
        return orig_pool(x, pool_idx, band=band)

    def unpool(x, unpool_idx, unpool_w, band=None):
        b, src1, c = x.shape
        vf1, taps = unpool_idx.shape
        rows = int(vf1) * int(taps)
        itemsize = np.dtype(x.dtype).itemsize
        records.append(dict(kind="unpool", v1=int(vf1), s=int(taps),
                            rows=rows, c=int(c),
                            bc=int(b) * int(c), src1=int(src1),
                            bytes_per_row=int(b) * int(c) * itemsize))
        return orig_unpool(x, unpool_idx, unpool_w, band=band)

    sconv.spiral_conv = conv
    sampling.pool = pool
    sampling.unpool = unpool
    # models.common binds the names at import time
    common.spiral_conv = conv
    common.pool = pool
    common.unpool = unpool


def trace_step(batch_size: int) -> list:
    """Build the bench-identical step and TRACE it (eval_shape — no
    execution), returning the op records."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    records: list = []
    _install_counters(records)

    from __graft_entry__ import _FULL_TOPO, _build, _host_batch
    from semantichuman_tpu.train.edits import EditSampler
    from semantichuman_tpu.train.optim import make_optimizer
    from semantichuman_tpu.train.step import StepFlags, make_train_step

    cache = _FULL_TOPO if os.path.exists(_FULL_TOPO) else None
    cfg, sh, _assets, _hier, model, tables = _build(
        cache_path=cache,
        model_overrides={"trunk_dtype": "bfloat16", "use_pallas": False})
    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                               cfg.train.lr_decay, steps_per_epoch=1)
    params = model.init(0)
    opt_state = optimizer.init(params)
    step = make_train_step(model, tables, optimizer, StepFlags(),
                           exc_variant="ori")

    sampler = EditSampler(seed=0)
    spec = sampler.sample_interp(epoch=200, batch_size=batch_size)
    bs = [_host_batch(sh, batch_size, seed=s, tables=tables)
          for s in range(3)]

    jax.eval_shape(step, params, opt_state, bs[0], bs[1], bs[2],
                   {k: np.asarray(v) for k, v in spec.items()})
    return records


def _dispatch_gates() -> dict:
    """The production dispatch thresholds, imported from the modules that
    run them — NOT re-hardcoded — so a gate change (e.g. a batch cap in
    `_banded_ok`, a preset retune) moves this model automatically.  The
    banded W per kind is the FIRST preset's window: `pick_band_spec`
    accepts the first preset whose out-of-band fraction passes, and the
    production topology passes on the first for all three kinds
    (docs/BENCHMARKS.md "band viability")."""
    import importlib

    from semantichuman_tpu.models import tables
    from semantichuman_tpu.ops import banding, sampling
    # the ops package re-exports the spiral_conv FUNCTION under the same
    # name, so the module must be imported by path
    sconv = importlib.import_module("semantichuman_tpu.ops.spiral_conv")

    return dict(
        conv_onehot_max_b=sconv._ONEHOT_MAX_B,
        conv_onehot_max_v1=sconv._ONEHOT_MAX_V1,
        samp_onehot_max_b=sampling._ONEHOT_MAX_B,
        samp_onehot_min_rows=sampling._ONEHOT_MIN_ROWS,
        band_min_v1=tables.BAND_MIN_V1,
        band_min_rows=tables.BAND_MIN_ROWS,
        # r4 measured batch caps: conv banding wins only at small batch,
        # unpool banding only up to B=128, pool banding nowhere
        conv_band_max_b=sconv._BANDED_MAX_B,
        unpool_band_max_b=sampling._UNPOOL_BAND_MAX_B,
        pool_band_max_b=0,
        band_w=dict(conv=banding.BAND_PRESETS[0][1],
                    pool=banding.POOL_BAND_PRESETS[0][1],
                    unpool=banding.UNPOOL_BAND_PRESETS[0][1]),
    )


def summarize(records: list, batch_size: int) -> dict:
    gates = _dispatch_gates()
    per_kind: dict = {}
    for r in records:
        key = (r["kind"], r["v1"], r["s"], r["c"])
        e = per_kind.setdefault(key, dict(calls=0, rows=0, gbytes=0.0,
                                          bc=r["bc"], src1=r["src1"]))
        e["calls"] += 1
        e["rows"] += r["rows"]
        e["gbytes"] += r["rows"] * r["bytes_per_row"] / 1e9

    # --- dispatch-aware op classification ---------------------------------
    # The production dispatcher routes small-batch ops through the ADOPTED
    # one-hot MXU forms (ops/spiral_conv._onehot_ok, ops/sampling._onehot_ok
    # — thresholds imported via _dispatch_gates), where they move NO gather
    # rows — the cost is a selection matmul instead.  At large batch
    # nothing qualifies and this matches the pure-gather model.
    def _onehot_route(kind, k, e):
        b = e["bc"] // max(k[3], 1)
        if kind == "conv":
            return (b <= gates["conv_onehot_max_b"]
                    and k[1] <= gates["conv_onehot_max_v1"])
        fine = e["src1"] if kind == "pool" else k[1]
        return (b <= gates["samp_onehot_max_b"]
                and fine >= gates["samp_onehot_min_rows"])

    def _mm_rows(kind, k, e):
        # matmul row count per kind: conv [V1*S, ...], pool [Vc1, ...],
        # unpool [Vf1, ...] — the unpool operator folds its `taps`
        # barycentric parents into ONE row (sampling.unpool_dense /
        # unpool_banded build U = sum_k one_hot*w_k), so the descriptor
        # count (vf1*taps) overstates its matmul rows by the tap factor.
        return e["rows"] // k[2] if kind == "unpool" else e["rows"]

    def _onehot_tflop(kind, k, e):
        # conv: [V1*S, V1] @ [V1, bc]; pool: [Vc1, Vf1] @ [Vf1, bc];
        # unpool: [Vf1, Vc1] @ [Vc1, bc]
        src = k[1] if kind == "conv" else e["src1"]
        return 2 * _mm_rows(kind, k, e) * src * e["bc"] / 1e12

    gather_ops, onehot_ops = {}, {}
    for k, e in per_kind.items():
        (onehot_ops if _onehot_route(k[0], k, e) else gather_ops)[k] = e

    rows_fwd = sum(e["rows"] for e in gather_ops.values())
    gb_fwd = sum(e["gbytes"] for e in gather_ops.values())
    # every trunk op sits on the differentiated path: the gather VJP is a
    # scatter-add of the SAME row count and (cotangent) byte volume
    rows_total = 2 * rows_fwd
    gb_total = 2 * gb_fwd

    t_issue_ms = rows_total * T_ISSUE_NS * 1e-6
    t_bw_ms = gb_total / BW_EFF_GBS * 1e3
    t_bw_typ_ms = gb_total / BW_EFF_GBS_TYP * 1e3
    # the two-regime bound applied per OP (max of regimes per op, summed)
    t_two_regime_ms = sum(
        2 * max(e["rows"] * T_ISSUE_NS * 1e-6,
                e["gbytes"] / BW_EFF_GBS * 1e3)
        for e in gather_ops.values())
    # the one-hot ops' MXU + streaming cost (fwd + transposed bwd); the
    # streamed buffer is the operator OUTPUT ([mm_rows, bc]) — the unpool
    # descriptor-row gbytes overstate it by the tap factor
    t_onehot_ms = sum(
        2 * max(_onehot_tflop(k[0], k, e) / PEAK_TFLOPS * 1e3,
                2 * (e["gbytes"] * _mm_rows(k[0], k, e) / e["rows"])
                / 819.0 * 1e3)
        for k, e in onehot_ops.items())
    # GFLOP/mesh * B [GFLOP] / peak [TFLOP/s] -> 1e9/1e12 s = milliseconds
    t_mxu_ms = GFLOP_PER_MESH * batch_size / PEAK_TFLOPS
    # the distance-loss/vol pieces were measured at B=128 and their kernel
    # grids scale with B — scale linearly for other batches (approximation)
    loss_ms = MEASURED_LOSS_MS * batch_size / 128.0
    vol_ms = MEASURED_VOL_MS * batch_size / 128.0

    bound_rows_only = t_issue_ms
    bound_gather_only = t_two_regime_ms + t_onehot_ms
    bound_full = bound_gather_only + t_mxu_ms + loss_ms + vol_ms

    # --- banded-path predicted ceiling ------------------------------------
    # The block-banded reformulation (ops/banding.py) converts a gather
    # into a selection MATMUL: per op, selection FLOPs = 2*mm_rows*W*(B*C)
    # (the one-hot contraction over the W-wide band), and the gathered
    # buffer's write+read moves at STREAMING bandwidth (dense stores/loads,
    # ~819 GB/s peak) instead of the gather engine's ~120-160 GB/s.
    # Backward mirrors both (transposed selection matmul + cotangent
    # traffic).  W per kind = the full-scale presets.
    # (the one-hot ops keep their one-hot route — dispatch order puts the
    # measured small-batch adoption first)
    #
    # DISPATCH-AWARE: only ops the production table builder actually bands
    # are converted (models/tables.py: conv bands iff V1 >= BAND_MIN_V1 —
    # L2/L3/L4 coarse convs stay on take at large batch; pool/unpool band
    # iff fine rows >= BAND_MIN_ROWS).  Everything else keeps its
    # two-regime gather cost, so this ceiling models banded_conv=true as
    # shipped, not a hypothetical all-banded trunk.
    def _bands(kind, k, e):
        # r4: the gate is batch-aware — the on-chip probe rejected conv
        # banding above B=16 and unpool banding above B=128 (FLOPs scale
        # with batch, the row floor does not), and pool banding everywhere
        b = e["bc"] // max(k[3], 1)
        if kind == "conv":
            return (k[1] >= gates["band_min_v1"]
                    and b <= gates["conv_band_max_b"])
        if kind == "pool":
            return (e["src1"] >= gates["band_min_rows"]
                    and b <= gates["pool_band_max_b"])
        return (k[1] >= gates["band_min_rows"]
                and b <= gates["unpool_band_max_b"])
    band_w = gates["band_w"]
    t_banded_ms = 0.0
    n_banded_ops = 0
    for k, e in gather_ops.items():
        kind = k[0]
        if not _bands(kind, k, e):
            t_banded_ms += 2 * max(e["rows"] * T_ISSUE_NS * 1e-6,
                                   e["gbytes"] / BW_EFF_GBS * 1e3)
            continue
        n_banded_ops += 1
        rows = _mm_rows(kind, k, e)
        gb = e["gbytes"] * rows / e["rows"]
        sel_tflop = 2 * rows * band_w[kind] * e["bc"] / 1e12
        t_fwd = max(sel_tflop / PEAK_TFLOPS * 1e3,
                    2 * gb / 819.0 * 1e3)
        t_banded_ms += 2 * t_fwd                      # fwd + bwd
    bound_banded_full = t_banded_ms + t_onehot_ms + t_mxu_ms + loss_ms + \
        vol_ms

    def mps(ms):
        return batch_size / max(ms, 1e-9) * 1e3

    out = dict(
        batch=batch_size,
        per_op=[dict(kind=k[0], v1=k[1], s=k[2], c_in=k[3], **v)
                for k, v in sorted(per_kind.items())],
        rows_fwd=rows_fwd, rows_fwd_plus_bwd=rows_total,
        gathered_gb_fwd=round(gb_fwd, 3),
        gathered_gb_fwd_plus_bwd=round(gb_total, 3),
        t_issue_floor_ms=round(t_issue_ms, 2),
        t_bandwidth_floor_ms_at_160gbs=round(t_bw_ms, 2),
        t_bandwidth_floor_ms_at_120gbs=round(t_bw_typ_ms, 2),
        t_two_regime_gather_bound_ms=round(t_two_regime_ms, 2),
        t_onehot_ops_bound_ms=round(t_onehot_ms, 2),
        n_onehot_routed_ops=len(onehot_ops),
        t_mxu_ms=round(t_mxu_ms, 2),
        loss_ms_scaled=round(loss_ms, 2), vol_ms_scaled=round(vol_ms, 2),
        bound_gathers_only_mps=round(mps(bound_gather_only), 1),
        bound_rows_only_mps=round(mps(bound_rows_only), 1),
        bound_full_step_mps=round(mps(bound_full), 1),
        bound_full_step_ms=round(bound_full, 2),
        banded_gather_bound_ms=round(t_banded_ms, 2),
        n_banded_ops=n_banded_ops,
        banded_full_step_bound_ms=round(bound_banded_full, 2),
        banded_full_step_bound_mps=round(mps(bound_banded_full), 1),
    )
    ach = STEP_MS_ACHIEVED.get(batch_size)
    if ach:
        out["achieved_mps"] = round(batch_size / ach * 1e3, 1)
        out["achieved_step_ms"] = round(ach, 2)
        out["pct_of_full_bound"] = round(100 * bound_full / ach, 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    records = trace_step(args.batch)
    s = summarize(records, args.batch)

    print(f"# B={args.batch} step: trunk gather/scatter inventory "
          f"(one row = one (vertex, slot) descriptor; batch+channels ride "
          f"inside the row)")
    print(f"{'kind':8} {'V1':>6} {'S':>3} {'c_in':>4} {'calls':>5} "
          f"{'rows(fwd)':>10} {'GB(fwd)':>8}")
    for e in s["per_op"]:
        print(f"{e['kind']:8} {e['v1']:>6} {e['s']:>3} {e['c_in']:>4} "
              f"{e['calls']:>5} {e['rows']:>10} {e['gbytes']:>8.3f}")
    print(json.dumps({k: v for k, v in s.items() if k != "per_op"},
                     indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(s, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
