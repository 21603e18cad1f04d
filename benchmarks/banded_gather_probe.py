"""Probe: spiral gather/scatter as a BANDED one-hot matmul (fine levels).

The r3 one-hot adoption (coarse_trunk_probe.py) converted the gather row
floor into MXU matmuls for levels 2-4 but was REJECTED at the two fine
levels (L0 0.76x, L1 1.16x) and at large batch (0.48x): the full one-hot
selection matrix is [V1*S, V1], so its FLOPs grow with V1^2*S and outrun
the ~100 ns/row gather/scatter floor exactly where V1 is big.

What the full form ignores is SPIRAL LOCALITY: on the production topology
97%+ of non-dummy spiral indices lie within a narrow band of their center
vertex (measured on assets/topology_synth_full_2222.npz: block R=512 /
window W=1024 leaves 2.3% of L0 entries out-of-band; R=256 / W=768 leaves
2.4% at 75% of the FLOPs).  A BLOCK-BANDED one-hot —
  g[v*S+s] = sum_w G[blk(v), (v%R)*S+s, w] * x[start(blk)+w]
— cuts the matmul's K dimension from V1 to W (a V1/W ~ 7-9x FLOP cut),
keeps the backward a pure (transposed) matmul instead of a scatter-add
over V1*S rows, and handles the out-of-band tail with an exact sparse
fixup (gather + at[].add over the ~2.3% positions; its VJP is a scatter
over the same ~2.3% of rows — the row floor shrinks 40x).  Dummy pads
(33% of L0 entries!) hit no band column and contribute an exact zero —
in the take form every pad still costs a full gather row.

The production form (ops/spiral_conv.py:spiral_conv_banded) builds the
selection tensor ON THE FLY (iota-compare) from the small spiral table —
a resident [nblk, R*S, W] bf16 table (~160 MB at L0) cannot ship as a jit
closure on the remote platform (HTTP 413) and measured no faster for the
full one-hot.  This probe measures BOTH: the production on-the-fly form
and a resident-G-as-argument local variant (isolates the build cost).

Measures fwd+bwd of the fine-level convs (production filter plan, both
the narrow encoder entry 3->16 and the wide decoder-side 16->16) at
B=12 (the paper recipe's concatenated 3-branch trunk batch), B=128 (the
fast recipe's B=64/i32 concatenated trunk), and B=384 (the headline
step's concatenated trunk batch), bf16 compute by default
(SH_TPU_PROBE_DTYPE=float32 for the fast recipe's f32-trunk decision),
against the production `spiral_conv_take` dispatcher.  Accept bar: the
established 1.2x.

  python benchmarks/banded_gather_probe.py
  SH_TPU_PROBE_B=128 SH_TPU_PROBE_LEVELS=0 python benchmarks/banded_gather_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = int(os.environ.get("SH_TPU_PROBE_ITERS", "100"))
# bf16 decides the headline trunk; the fast recipe trains f32 — its banding
# decision needs SH_TPU_PROBE_DTYPE=float32 cells (selection-matmul FLOPs
# double, the gather row floor does not)
DTYPE = os.environ.get("SH_TPU_PROBE_DTYPE", "bfloat16")


def build_band_tables(sp: np.ndarray, R: int, W: int):
    """Production BandSpec (ops/banding.py) + the resident bf16 G tensor
    the local comparison variant feeds as a device argument."""
    import ml_dtypes

    from semantichuman_tpu.ops.banding import build_band_spec

    spec = build_band_spec(sp, R, W)
    v1, s = sp.shape
    starts = np.asarray(spec.starts, np.int64)
    rel = sp + W - starts[np.arange(v1) // R][:, None]   # [v1, S]
    hit = (rel >= 0) & (rel < W)
    nblk = spec.nblk
    G = np.zeros((nblk, R * s, W), dtype=ml_dtypes.bfloat16)
    vv, ss = np.nonzero(hit)
    G[vv // R, (vv % R) * s + ss, rel[vv, ss]] = 1.0
    return {"spec": spec, "G": G, "starts": spec.starts,
            "fix_pos": spec.fix_pos, "fix_src": spec.fix_src,
            "R": R, "W": W, "v1": v1, "s": s, "oob_frac": spec.oob_frac}


def banded_conv(x, G, fix_pos, fix_src, w, bias, starts, R, W,
                activation="elu", compute_dtype=None):
    """Resident-G comparison variant: the banded selection tensor rides as
    a device ARGUMENT instead of being built on the fly inside the trace
    (the production form, ops/spiral_conv.py:spiral_conv_banded)."""
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.ops.spiral_conv import ACTIVATIONS

    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, v1, c = x.shape
    nblk, rs, _ = G.shape
    s = rs // R
    xp = jnp.transpose(x, (1, 0, 2)).reshape(v1, b * c)
    xpad = jnp.pad(xp, ((W, W), (0, 0)))
    win = jnp.stack([jax.lax.dynamic_slice_in_dim(xpad, int(st), W)
                     for st in starts])                  # [nblk, W, B*C]
    g = jnp.einsum("nrw,nwc->nrc", G.astype(x.dtype), win,
                   preferred_element_type=x.dtype)       # [nblk, R*S, B*C]
    g = g.reshape(nblk * R * s, b * c)[:v1 * s]
    g = g.at[fix_pos].add(jnp.take(xp, fix_src, axis=0))
    g = (g.reshape(v1, s, b, c).transpose(2, 0, 1, 3)
         .reshape(b, v1, s * c))
    y = jnp.dot(g, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[:, -1, :].set(0.0)


from benchmarks._timing import timed_grad  # noqa: E402


def _timed_grad(fn, args, iters=ITERS):
    """Shared harness (benchmarks/_timing.py), historical sum reduction."""
    return timed_grad(fn, args, iters, reduction="sum")


def main():
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()
    from semantichuman_tpu.ops.spiral_conv import (spiral_conv_banded,
                                                   spiral_conv_take)
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    hier = MeshHierarchy.load(os.path.join(REPO, "assets",
                                           "topology_synth_full_2222.npz"))
    env_b = os.environ.get("SH_TPU_PROBE_B")
    batches = [int(env_b)] if env_b else [12, 128, 384]
    env_l = os.environ.get("SH_TPU_PROBE_LEVELS")
    levels = ([int(x) for x in env_l.split(",")] if env_l else [0, 1])
    # production filter plan shapes per level: (c_in, c_out) — encoder
    # entry + the wide decoder-side conv at the same level
    plan = {0: [(3, 16), (16, 16)], 1: [(16, 32), (32, 32)]}
    # remote compiles are 1-3 min each: default to the FLOP-optimal preset
    # and the production on-the-fly form only (SH_TPU_PROBE_BANDS=all adds
    # the wide preset; SH_TPU_PROBE_RESIDENT=1 adds the resident-G variant)
    bands = ([(256, 768), (512, 1024)]
             if os.environ.get("SH_TPU_PROBE_BANDS") == "all"
             else [(256, 768)])
    resident = os.environ.get("SH_TPU_PROBE_RESIDENT") == "1"

    cdt = getattr(jnp, DTYPE)
    rng = np.random.default_rng(0)
    out = []
    for lvl in levels:
        sp_np = np.asarray(hier.spirals[lvl])
        v1, s = sp_np.shape
        sp = jnp.asarray(sp_np)
        if resident:
            tabs = {rw: build_band_tables(sp_np, *rw) for rw in bands}
            dev_tabs = {rw: {k: jnp.asarray(v) for k, v in t.items()
                             if isinstance(v, np.ndarray)}
                        for rw, t in tabs.items()}
        else:
            import dataclasses

            from semantichuman_tpu.ops.banding import (build_band_spec,
                                                       build_diag_spec)
            specs = {rw: build_band_spec(sp_np, *rw) for rw in bands}
            if os.environ.get("SH_TPU_PROBE_PALLAS") == "1":
                specs = {rw: dataclasses.replace(
                    s, diag=build_diag_spec(sp_np, rw[0], rw[1] // rw[0] + 1))
                    for rw, s in specs.items()}
            tabs = {rw: {"spec": specs[rw], "starts": None,
                         "oob_frac": specs[rw].oob_frac}
                    for rw in bands}
            dev_tabs = {rw: {} for rw in bands}
        for c_in, c_out in plan[lvl]:
            w = jnp.asarray(rng.standard_normal((s * c_in, c_out)) * 0.02,
                            jnp.float32)
            bias = jnp.zeros((c_out,), jnp.float32)
            for b in batches:
                x = np.asarray(rng.standard_normal((b, v1, c_in)),
                               np.float32)
                x[:, -1] = 0.0
                x = jnp.asarray(x)
                rec = {"level": lvl, "c_in": c_in, "c_out": c_out,
                       "batch": b, "v1": v1, "s": s, "dtype": DTYPE}
                t_take = _timed_grad(
                    lambda xx, spx, wx, bx: spiral_conv_take(
                        xx, spx, wx, bx, "elu", compute_dtype=cdt),
                    (x, sp, w, bias))
                rec["take_ms"] = round(t_take * 1e3, 3)
                y_ref = spiral_conv_take(x, sp, w, bias, "elu",
                                         compute_dtype=cdt)
                for (R, W) in bands:
                    dt = dev_tabs[(R, W)]
                    spec = tabs[(R, W)]["spec"]
                    # production on-the-fly form
                    t_fly = _timed_grad(
                        lambda xx, spx, wx, bx, _sp=spec: spiral_conv_banded(
                            xx, spx, _sp, wx, bx, "elu",
                            compute_dtype=cdt),
                        (x, sp, w, bias))
                    y_fly = spiral_conv_banded(
                        x, sp, spec, w, bias, "elu",
                        compute_dtype=cdt)
                    err = float(jnp.max(jnp.abs(y_ref - y_fly)))
                    rec[f"band{R}x{W}_fly_ms"] = round(t_fly * 1e3, 3)
                    rec[f"band{R}x{W}_fly_speedup"] = round(t_take / t_fly, 2)
                    if resident:
                        t_band = _timed_grad(
                            lambda xx, Gx, fp, fs, wx, bx, _R=R, _W=W,
                                   _st=tabs[(R, W)]["starts"]: banded_conv(
                                xx, Gx, fp, fs, wx, bx, _st, _R, _W,
                                "elu", compute_dtype=cdt),
                            (x, dt["G"], dt["fix_pos"], dt["fix_src"],
                             w, bias))
                        rec[f"band{R}x{W}_res_ms"] = round(t_band * 1e3, 3)
                    if getattr(spec, "diag", None) is not None:
                        from semantichuman_tpu.ops.spiral_conv import \
                            spiral_conv_banded_pallas
                        t_pal = _timed_grad(
                            lambda xx, spx, wx, bx,
                                   _sp=spec: spiral_conv_banded_pallas(
                                xx, spx, _sp, wx, bx, "elu",
                                compute_dtype=cdt),
                            (x, sp, w, bias))
                        y_pal = spiral_conv_banded_pallas(
                            x, sp, spec, w, bias, "elu", compute_dtype=cdt)
                        rec[f"band{R}x{W}_pallas_ms"] = round(t_pal * 1e3, 3)
                        rec[f"band{R}x{W}_pallas_speedup"] = round(
                            t_take / t_pal, 2)
                        rec[f"band{R}x{W}_pallas_vs_fly"] = round(
                            t_fly / t_pal, 2)
                        rec[f"band{R}x{W}_pallas_err"] = float(
                            jnp.max(jnp.abs(y_ref - y_pal)))
                        rec[f"band{R}x{W}_pallas_oob_pct"] = round(
                            100 * spec.diag.oob_frac, 2)
                    rec[f"band{R}x{W}_err"] = err
                    rec[f"band{R}x{W}_oob_pct"] = round(
                        100 * tabs[(R, W)]["oob_frac"], 2)
                print(json.dumps(rec), flush=True)
                out.append(rec)
    return out


def main_sampling():
    """Banded pool/unpool vs take at large batch (the one-hot forms own
    small batch; the take path owns B>=32 today)."""
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()
    from semantichuman_tpu.ops import sampling as S
    from semantichuman_tpu.ops.banding import (POOL_BAND_PRESETS,
                                               UNPOOL_BAND_PRESETS,
                                               build_band_spec)
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    hier = MeshHierarchy.load(os.path.join(REPO, "assets",
                                           "topology_synth_full_2222.npz"))
    env_b = os.environ.get("SH_TPU_PROBE_B")
    batches = [int(env_b)] if env_b else [128, 384]
    rng = np.random.default_rng(0)
    out = []
    for lvl in (0, 1):
        idx = np.asarray(hier.unpool_idx[lvl])
        wgt = np.asarray(hier.unpool_w[lvl])
        vf1 = idx.shape[0]
        vc1 = hier.sizes[lvl + 1] + 1
        uspec = build_band_spec(idx, *UNPOOL_BAND_PRESETS[0],
                                dummy=vc1 - 1)
        pidx = np.asarray(hier.pool_idx[lvl])
        pspec = build_band_spec(pidx[:, None], *POOL_BAND_PRESETS[0],
                                dummy=vf1 - 1)
        # one channel width: the banded-vs-take decision is about rows vs
        # FLOPs, and C only scales both sides' row width equally (remote
        # compiles at 1-3 min each are the scarce resource here)
        for c in (16,):
            for b in batches:
                # dummy source rows must be zero (the model invariant the
                # banded forms' pad/fixup no-ops rely on)
                x = np.asarray(rng.standard_normal((b, vc1, c)), np.float32)
                x[:, -1] = 0.0
                x = jnp.asarray(x)
                t_take = _timed_grad(
                    lambda xx, ix, wx: S.unpool_take(xx, ix, wx),
                    (x, jnp.asarray(idx), jnp.asarray(wgt)))
                t_band = _timed_grad(
                    lambda xx, ix, wx, _sp=uspec: S.unpool_banded(
                        xx, ix, wx, _sp),
                    (x, jnp.asarray(idx), jnp.asarray(wgt)))
                err = float(jnp.max(jnp.abs(
                    S.unpool_take(x, jnp.asarray(idx), jnp.asarray(wgt))
                    - S.unpool_banded(x, jnp.asarray(idx),
                                      jnp.asarray(wgt), uspec))))
                rec = {"op": "unpool", "level": lvl, "c": c, "batch": b,
                       "take_ms": round(t_take * 1e3, 3),
                       "band_ms": round(t_band * 1e3, 3),
                       "band_speedup": round(t_take / t_band, 2),
                       "err": err,
                       "oob_pct": round(100 * uspec.oob_frac, 2)}
                print(json.dumps(rec), flush=True)
                out.append(rec)

                xf = np.asarray(rng.standard_normal((b, vf1, c)),
                                np.float32)
                xf[:, -1] = 0.0
                xf = jnp.asarray(xf)
                t_take = _timed_grad(
                    lambda xx, ix: S.pool_take(xx, ix),
                    (xf, jnp.asarray(pidx)))
                t_band = _timed_grad(
                    lambda xx, ix, _sp=pspec: S.pool_banded(xx, ix, _sp),
                    (xf, jnp.asarray(pidx)))
                err = float(jnp.max(jnp.abs(
                    S.pool_take(xf, jnp.asarray(pidx))
                    - S.pool_banded(xf, jnp.asarray(pidx), pspec))))
                rec = {"op": "pool", "level": lvl, "c": c, "batch": b,
                       "take_ms": round(t_take * 1e3, 3),
                       "band_ms": round(t_band * 1e3, 3),
                       "band_speedup": round(t_take / t_band, 2),
                       "err": err,
                       "oob_pct": round(100 * pspec.oob_frac, 2)}
                print(json.dumps(rec), flush=True)
                out.append(rec)
    return out


if __name__ == "__main__":
    main()
    if os.environ.get("SH_TPU_PROBE_SAMPLING", "1") == "1":
        main_sampling()
