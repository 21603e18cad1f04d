"""Derive the VPU roofline of the weighted-distance loss kernel.

The gather roofline (benchmarks/row_floor_roofline.py) closed the trunk
question but carries the distance losses as a MEASURED 72.9 ms constant —
after banding they become the LARGEST step component (~48 % of the
predicted 153 ms banded ceiling).  This script derives whether that
72.9 ms is itself at a platform bound, the same way the gather one did:

  1. trace the fused kernel's per-tile math (ops/pallas/part_dist_pallas —
     the mirror functions below are built from the kernel module's OWN
     helpers) to a jaxpr and inventory every VPU element-op;
  2. calibrate a sustained element-op rate R from the r2 on-chip mode
     ablation (ONE loss invocation, production shape: threshold 18.05 ms,
     sin 15.03, all_one 9.93 — docs/BENCHMARKS.md "binding resources").
     Three modes with very different op mixes give three independent
     estimates of R; if they agree, the kernel is VPU-ISSUE-bound and R is
     the platform constant;
  3. predict from first principles: the two-kernel step cost (vs the
     measured 72.9 ms — model validation), the one-pass-VJP step cost
     (the bar for the queued SH_TPU_DIST_ONEPASS on-chip A/B), and the
     post-banding step ceilings with each loss variant.

Spec anchors (public v5e): bf16 MXU peak 197 TFLOP/s = 4 MXUs x 128x128
x 2 flop at ~1.50 GHz; the VPU is 4 ALUs x (8, 128) lanes at the same
clock -> 1.54e12 element-ops/s single-ALU issue, 6.2e12 at 4-ALU peak.
Transcendentals (sqrt, div) are multi-cycle, so sustained R lands between
the two; the calibration below says where.

Runs entirely on CPU (tracing + arithmetic — no chip needed):

    python benchmarks/dist_loss_roofline.py [--batch 128] [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
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

# --- measured calibration points (r2 on-chip, docs/BENCHMARKS.md) -----------
# one full loss invocation (every part, fwd kernel only) at the production
# shape, per weight mode
MEASURED_FWD_MS = {"threshold": 18.05, "sin": 15.03, "all_one": 9.93}
# both loss branches, fwd+bwd, inside the B=128 step (step_breakdown.py)
MEASURED_STEP_LOSS_MS = 72.9
N_BRANCHES = 2          # interp_euc + exc_euc (train/step.py:199,231)

# --- spec anchors (public v5e) ----------------------------------------------
CLOCK_GHZ = 197.0 / (4 * 128 * 128 * 2) / 1e-3   # ~1.50 GHz from MXU peak
VPU_LANES = 8 * 128
R_SINGLE_ALU = VPU_LANES * CLOCK_GHZ * 1e9       # elem-ops/s, 1 op/cycle
R_PEAK_4ALU = 4 * R_SINGLE_ALU
HBM_STREAM_GBS = 819.0
PEAK_TFLOPS = 197.0

_LANES = 128


# --- tile mirrors ------------------------------------------------------------
# These reproduce the pallas kernel bodies OUTSIDE pallas (plain arrays) so
# they can be traced by jax.make_jaxpr.  They call the kernel module's own
# helpers (_weights_de_mask, _pair_dists) — only the few composition lines
# are mirrored, and tests/test_dist_roofline.py pins them equal to the real
# interpret-mode kernels so drift cannot go unnoticed.

def _resolve_fast(fast_acos, w_mode, w_threshold):
    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd
    if fast_acos is None:       # mirror the kernel call sites' env resolution
        return pd._use_fast_acos(w_mode, w_threshold)
    return fast_acos


def _mirror_fwd(vp, rp, bone, n_real, allone, a, *, n_pad, w_mode,
                w_threshold, relat, fast_acos=None):
    import jax.numpy as jnp

    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd
    w, de, mask = pd._weights_de_mask(
        vp, bone, n_real, allone, a, n_pad=n_pad, w_mode=w_mode,
        w_threshold=w_threshold,
        fast_acos=_resolve_fast(fast_acos, w_mode, w_threshold))
    de_r = jnp.where(mask, pd._pair_dists(rp), 0.0)
    if relat:
        de_safe = jnp.where(mask, de, 1.0)
        term = jnp.abs(w * (de_r / de_safe) - w)
    else:
        term = jnp.abs(w * de_r - w * de)
    term = jnp.where(mask, term, 0.0)
    return jnp.sum(term), jnp.sum(mask.astype(jnp.float32))


def _mirror_bwd(vp, rp, bone, n_real, allone, a, ct, *, n_pad, w_mode,
                w_threshold, relat, fast_acos=None):
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd
    w, de, mask = pd._weights_de_mask(
        vp, bone, n_real, allone, a, n_pad=n_pad, w_mode=w_mode,
        w_threshold=w_threshold,
        fast_acos=_resolve_fast(fast_acos, w_mode, w_threshold))
    de_r = pd._pair_dists(rp)
    if relat:
        de_safe = jnp.where(mask, de, 1.0)
        g = (w / de_safe) * jnp.sign(w * (de_r / de_safe) - w)
    else:
        g = w * jnp.sign(w * de_r - w * de)
    g = jnp.where(mask, g * ct, 0.0)
    coef = jnp.where(de_r > 0.0, g / jnp.where(de_r > 0.0, de_r, 1.0), 0.0)
    rowsum = jnp.sum(coef, axis=1, keepdims=True)
    mixed = jax.lax.dot_general(coef, rp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return 2.0 * (rp * rowsum - mixed)


def _mirror_fwd_grad(vp, rp, bone, n_real, allone, a, *, n_pad, w_mode,
                     w_threshold, relat, fast_acos=None):
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd
    w, de, mask = pd._weights_de_mask(
        vp, bone, n_real, allone, a, n_pad=n_pad, w_mode=w_mode,
        w_threshold=w_threshold,
        fast_acos=_resolve_fast(fast_acos, w_mode, w_threshold))
    de_r0 = pd._pair_dists(rp)
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
    mixed = jax.lax.dot_general(coef, rp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    g0 = 2.0 * (rp * rowsum - mixed)
    return jnp.sum(term), jnp.sum(mask.astype(jnp.float32)), g0


# --- jaxpr op inventory -------------------------------------------------------

# layout-only primitives: fused into consumers on the VPU (no issue slot of
# their own in Mosaic's vreg model); tracked separately for transparency
_FREE = {"broadcast_in_dim", "reshape", "transpose", "squeeze",
         "expand_dims", "copy", "stop_gradient"}
# reductions touch every INPUT element once
_REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "reduce_and",
           "reduce_or", "reduce_prod", "argmax", "argmin"}


def count_ops(fn, *args):
    """Trace fn and inventory its compute: returns a dict with total VPU
    element-ops (one per output element of every non-layout, non-matmul
    primitive; reductions count input elements), MXU flops (dot_general),
    and per-primitive element counts."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    tot = dict(vpu_elem_ops=0, mxu_flops=0, free_elems=0, by_prim={})

    def _elems(v):
        return int(np.prod(v.aval.shape)) if v.aval.shape else 1

    def walk(jx):
        for eqn in jx.eqns:
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):          # ClosedJaxpr
                    walk(p.jaxpr)
                elif hasattr(p, "eqns"):         # raw Jaxpr
                    walk(p)
            name = eqn.primitive.name
            if name in ("pjit", "jit", "custom_jvp_call", "custom_vjp_call",
                        "closed_call", "core_call", "remat_call", "remat",
                        "checkpoint", "scan", "while", "cond"):
                continue                          # counted via sub-jaxpr
            if name == "dot_general":
                (lc, _rc), _ = eqn.params["dimension_numbers"]
                k = int(np.prod([eqn.invars[0].aval.shape[d] for d in lc]))
                out = sum(_elems(v) for v in eqn.outvars)
                tot["mxu_flops"] += 2 * out * k
                continue
            if name in _FREE:
                tot["free_elems"] += sum(_elems(v) for v in eqn.outvars)
                continue
            if name in _REDUCE:
                n = sum(_elems(v) for v in eqn.invars)
            else:
                n = sum(_elems(v) for v in eqn.outvars)
            tot["vpu_elem_ops"] += n
            tot["by_prim"][name] = tot["by_prim"].get(name, 0) + n
    walk(jaxpr.jaxpr)
    return tot


def tile_counts(n_pad: int, w_mode: str, relat: bool = True,
                w_threshold: float = 0.8, fast_acos: bool = False):
    """Op inventory of one (part, batch-element) tile for each kernel
    variant at tile height n_pad.  fast_acos=False is the calibration form
    (the form MEASURED_FWD_MS was measured on); True inventories the r5
    threshold fast path for the forward prediction."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    f32 = functools.partial(jax.ShapeDtypeStruct, dtype=jnp.float32)
    i32 = functools.partial(jax.ShapeDtypeStruct, dtype=jnp.int32)
    vp, rp = f32((n_pad, _LANES)), f32((n_pad, _LANES))
    bone = f32((1, _LANES))
    nr, ao = i32(()), i32(())
    a, ct = f32(()), f32(())
    kw = dict(n_pad=n_pad, w_mode=w_mode, w_threshold=w_threshold,
              relat=relat, fast_acos=fast_acos)
    mk = jax.eval_shape  # noqa: F841  (shapes only — count_ops re-traces)
    return dict(
        fwd=count_ops(functools.partial(_mirror_fwd, **kw),
                      vp, rp, bone, nr, ao, a),
        bwd=count_ops(functools.partial(_mirror_bwd, **kw),
                      vp, rp, bone, nr, ao, a, ct),
        fwd_grad=count_ops(functools.partial(_mirror_fwd_grad, **kw),
                           vp, rp, bone, nr, ao, a),
    )


# --- production invocation shape ---------------------------------------------

def production_buckets():
    """(buckets, batch-invariant grid info) for the full-scale model: list
    of (n_pad, n_parts_in_bucket) the fused wrapper launches."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _FULL_TOPO, _build
    from semantichuman_tpu.ops.pallas.part_dist_pallas import PartDistTables

    cache = _FULL_TOPO if os.path.exists(_FULL_TOPO) else None
    _cfg, _sh, _assets, _hier, _model, tables = _build(
        cache_path=cache,
        model_overrides={"trunk_dtype": "bfloat16", "use_pallas": False})
    ptab = PartDistTables(tables.part_indices, leafkeep=True,
                          w_mode="threshold")
    return [(bk["n_pad"], len(bk["part_ids"])) for bk in ptab.buckets]


# --- the roofline ------------------------------------------------------------

def summarize(buckets, batch: int, measured_fwd_ms=None,
              measured_step_loss_ms: float = MEASURED_STEP_LOSS_MS) -> dict:
    measured_fwd_ms = measured_fwd_ms or MEASURED_FWD_MS

    # per-variant totals for ONE loss invocation (every part, B tiles each)
    def invocation(kind: str, w_mode: str, fast_acos: bool = False):
        ops = flops = 0
        for n_pad, pc in buckets:
            c = tile_counts(n_pad, w_mode, fast_acos=fast_acos)[kind]
            ops += pc * batch * c["vpu_elem_ops"]
            flops += pc * batch * c["mxu_flops"]
        return ops, flops

    inv = {m: invocation("fwd", m) for m in measured_fwd_ms}
    # calibration: one implied R per measured mode.  The three modes have
    # very different op mixes (all_one skips the whole angle computation),
    # so their agreement is the issue-bound evidence; step PREDICTIONS use
    # the mode the production step actually runs (threshold) so the model
    # reproduces the standalone measurement by construction and the only
    # extrapolation is the bwd/fwd_grad op-count ratio.
    rates = {m: inv[m][0] / (measured_fwd_ms[m] * 1e-3)
             for m in measured_fwd_ms}
    r_mean = float(np.mean(list(rates.values())))
    r_cal = rates["threshold"]
    spread = (max(rates.values()) - min(rates.values())) / r_mean

    ops_fwd, _ = inv["threshold"]
    ops_bwd, flops_bwd = invocation("bwd", "threshold")
    ops_fg, flops_fg = invocation("fwd_grad", "threshold")
    # the r5 threshold fast path (SH_TPU_DIST_FASTACOS): same one-pass
    # kernel, arcsin range reduction dropped — calibration stays on the
    # fast_acos=False counts (the form MEASURED_FWD_MS was measured on)
    ops_fg_fast, flops_fg_fast = invocation("fwd_grad", "threshold",
                                            fast_acos=True)

    def ms(ops):
        return ops / r_cal * 1e3

    # streaming cost of the one-pass residual: g0 written by the kernel,
    # then read + drp written by the outside multiply (3 passes over the
    # [grid, n_pad, 128] f32 buffer)
    g0_gb = sum(pc * batch * n_pad * _LANES * 4 for n_pad, pc in buckets) \
        / 1e9
    t_g0_ms = 3 * g0_gb / HBM_STREAM_GBS * 1e3

    # MXU matmuls in bwd/fwd_grad (coef @ rp): tiny but counted
    def mxu_ms(flops):
        return flops / 1e12 / PEAK_TFLOPS * 1e3

    # step-level (N_BRANCHES invocations, threshold mode, fwd+bwd each)
    step_two_kernel_ms = N_BRANCHES * (
        ms(ops_fwd) + ms(ops_bwd) + mxu_ms(flops_bwd))
    step_one_pass_ms = N_BRANCHES * (
        ms(ops_fg) + mxu_ms(flops_fg) + t_g0_ms)
    step_one_pass_fast_ms = N_BRANCHES * (
        ms(ops_fg_fast) + mxu_ms(flops_fg_fast) + t_g0_ms)

    return dict(
        batch=batch,
        buckets=[dict(n_pad=n, parts=p) for n, p in buckets],
        grid=sum(p for _, p in buckets) * batch,
        # per-invocation inventory (threshold)
        vpu_ops_fwd=ops_fwd, vpu_ops_bwd=ops_bwd, vpu_ops_fwd_grad=ops_fg,
        mxu_flops_bwd=flops_bwd, mxu_flops_fwd_grad=flops_fg,
        vpu_ops_fwd_by_mode={m: inv[m][0] for m in inv},
        # calibration
        implied_rate_elem_ops_per_s={m: round(r, -9) for m, r in
                                     rates.items()},
        r_calibrated=round(r_cal, -9),
        r_mean=round(r_mean, -9),
        r_spread_frac=round(spread, 3),
        r_single_alu=round(R_SINGLE_ALU, -9),
        r_peak_4alu=round(R_PEAK_4ALU, -9),
        pct_of_single_alu_issue=round(100 * r_cal / R_SINGLE_ALU, 1),
        # model validation vs the measured in-step number
        step_loss_model_two_kernel_ms=round(step_two_kernel_ms, 1),
        step_loss_measured_ms=measured_step_loss_ms,
        model_vs_measured_pct=round(
            100 * step_two_kernel_ms / measured_step_loss_ms, 1),
        # the one-pass prediction (the queued on-chip A/B's bar)
        step_loss_one_pass_ms=round(step_one_pass_ms, 1),
        one_pass_saving_ms=round(step_two_kernel_ms - step_one_pass_ms, 1),
        # r5 levers: q-dedup is already inside the fwd_grad mirror (it is
        # the shipped kernel); fast_acos drops the arcsin range reduction
        vpu_ops_fwd_grad_fast=ops_fg_fast,
        step_loss_one_pass_fast_ms=round(step_one_pass_fast_ms, 1),
        fast_acos_saving_ms=round(step_one_pass_ms - step_one_pass_fast_ms,
                                  1),
        g0_stream_gb_per_invocation=round(g0_gb, 3),
        g0_stream_ms_per_invocation=round(t_g0_ms, 2),
    )


def compose_step_ceilings(dl: dict, batch: int) -> dict:
    """Fold the loss model into the gather roofline's step ceilings: what
    the full step becomes under (take|banded) x (two-kernel|one-pass)."""
    from benchmarks import row_floor_roofline as rl

    records = rl.trace_step(batch)
    s = rl.summarize(records, batch)
    gather_take = s["t_two_regime_gather_bound_ms"] + \
        s["t_onehot_ops_bound_ms"]
    gather_banded = s["banded_gather_bound_ms"] + s["t_onehot_ops_bound_ms"]
    fixed = s["t_mxu_ms"] + s["vol_ms_scaled"]

    def step(gather_ms, loss_ms):
        t = gather_ms + fixed + loss_ms
        return dict(step_ms=round(t, 1),
                    mps=round(batch / t * 1e3, 1))

    two_k = dl["step_loss_model_two_kernel_ms"]
    one_p = dl["step_loss_one_pass_ms"]
    meas = dl["step_loss_measured_ms"]
    return dict(
        gather_take_ms=round(gather_take, 1),
        gather_banded_ms=round(gather_banded, 1),
        fixed_ms=round(fixed, 2),
        take_measured_loss=step(gather_take, meas),
        take_one_pass=step(gather_take, one_p),
        banded_measured_loss=step(gather_banded, meas),
        banded_one_pass=step(gather_banded, one_p),
        loss_share_of_banded_pct=round(
            100 * meas / (gather_banded + fixed + meas), 1),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-step", action="store_true",
                    help="skip the full-step ceiling composition (faster)")
    args = ap.parse_args(argv)

    buckets = production_buckets()
    s = summarize(buckets, args.batch)

    print("# distance-loss VPU inventory (one invocation = every part, "
          f"B={args.batch} tiles each; grid={s['grid']})")
    th = tile_counts(buckets[0][0], "threshold")
    top = sorted(th["fwd"]["by_prim"].items(), key=lambda kv: -kv[1])[:8]
    npad0 = buckets[0][0]
    print(f"  top fwd primitives per {npad0}x{npad0} tile: "
          + ", ".join(f"{k}={v / npad0**2:.1f}p" for k, v in top)
          + "  (p = passes over the tile)")
    if not args.no_step:
        s["step_ceilings"] = compose_step_ceilings(s, args.batch)
    print(json.dumps({k: v for k, v in s.items() if k != "buckets"},
                     indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(s, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
