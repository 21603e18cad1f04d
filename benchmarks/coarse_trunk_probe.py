"""Probe: spiral gather/scatter as one-hot MXU matmuls (per level, fwd+bwd).

VERDICT r2 item 4 asked for ONE bounded experiment on the coarse-trunk /
backward-scatter cost before closing the kernel question.  The literal
proposal — fuse levels 2-4 into a single Pallas program with in-VMEM
gathers — is excluded by arithmetic before any measurement:
  * Mosaic rejects vectorized in-VMEM gathers ("multiple source vregs
    along gather dimension") at ANY real V (r2 probe record,
    ops/pallas/spiral_conv_pallas.py), so the "index op" form cannot
    lower;
  * the only in-VMEM gather that CAN lower is a one-hot matmul, and the
    level-2 one-hot table ([V1*S, V1] = [13800, 1725] bf16 = 47.6 MB)
    alone exceeds the ~16 MB VMEM budget.

What CAN attack the measured cost (trunk backward = 3.1x forward, bound
by XLA scatter-add at ~100 ns/row, batch-independent) is the same
one-hot formulation at the XLA level: gather = G @ x with G a [V1*S, V1]
one-hot bf16 matrix.  The VJP is then G^T @ dy — ANOTHER MXU matmul —
so the backward's per-row scatter floor disappears entirely.  The trade
is FLOPs (factor ~V1/C_out over the direct conv matmul) for rows, which
should win exactly where the VERDICT pointed: small batch, where the
row floor dominates and the MXU idles.

This probe measures fwd+bwd of each encoder level's conv (paper filter
plan) in both formulations at B=4 and B=128, bf16 compute, on the real
full-scale topology.  Both sides import the EXPLICIT production forms
(spiral_conv_take/spiral_conv_onehot, pool_take/pool_dense,
unpool_take/unpool_dense) rather than the public dispatchers — the
dispatchers now adopt the one-hot path at small batch (this probe's own
finding), so measuring them would compare the adopted path to itself.
Probe-only rejected variants (resident-G conv, Precision.HIGHEST unpool)
stay local.  Timing uses jitted multi-iteration loops with a
data dependency (naive re-run loops overlap on the axon remote platform
— see docs/BENCHMARKS.md).

  python benchmarks/coarse_trunk_probe.py          # full (B=4 and 128)
  SH_TPU_PROBE_B=4 python benchmarks/coarse_trunk_probe.py
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


def onehot_table(spiral_idx: np.ndarray) -> np.ndarray:
    """[V1, S] spiral table -> [V1*S, V1] one-hot bf16 selection matrix
    (built host-side directly in bf16: the L0 table is 0.7 GB — f32
    doubles that and can swap the 1-core host)."""
    import ml_dtypes
    import jax.numpy as jnp

    v1, s = spiral_idx.shape
    g = np.zeros((v1 * s, v1), ml_dtypes.bfloat16)
    g[np.arange(v1 * s), np.asarray(spiral_idx).reshape(-1)] = 1.0
    return jnp.asarray(g)


def onehot_conv(x, G, s, w, bias, activation="elu", compute_dtype=None):
    """spiral_conv with the gather as a one-hot matmul (selection is exact:
    each output row sums exactly one bf16 product of a 1.0)."""
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.ops.spiral_conv import ACTIVATIONS

    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, v1, c = x.shape
    xp = jnp.transpose(x, (1, 0, 2)).reshape(v1, b * c)
    g = jnp.dot(G.astype(x.dtype), xp,
                preferred_element_type=x.dtype)          # [V1*S, B*C]
    g = g.reshape(v1, s, b, c).transpose(2, 0, 1, 3).reshape(b, v1, s * c)
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
    from semantichuman_tpu.ops.spiral_conv import (spiral_conv_onehot,
                                                   spiral_conv_take)
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    hier = MeshHierarchy.load(os.path.join(REPO, "assets",
                                           "topology_synth_full_2222.npz"))
    enc_filters = [3, 16, 32, 64, 128]
    batches = ([int(os.environ["SH_TPU_PROBE_B"])]
               if "SH_TPU_PROBE_B" in os.environ else [4, 128])

    levels = [int(x) for x in
              os.environ.get("SH_TPU_PROBE_LEVELS", "2,3,4").split(",")]
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0].device_kind), "levels": []}
    for lvl in levels:
        sp = np.asarray(hier.spirals[lvl])
        v1, s = sp.shape
        c_in = enc_filters[lvl] if lvl < len(enc_filters) - 1 else enc_filters[-1]
        c_out = (enc_filters[lvl + 1] if lvl < len(enc_filters) - 1
                 else enc_filters[-1])
        w = jnp.asarray(rng.standard_normal((s * c_in, c_out)) * 0.05,
                        jnp.float32)
        bias = jnp.zeros((c_out,), jnp.float32)
        sp_j = jnp.asarray(sp)
        G = onehot_table(sp)
        rec = {"level": lvl, "v1": int(v1), "s": int(s), "c_in": c_in,
               "c_out": c_out,
               "G_mb": round(G.size * 2 / 1e6, 1), "by_batch": {}}
        for b in batches:
            x = jnp.asarray(rng.standard_normal((b, v1, c_in)), jnp.float32)
            t_take = _timed_grad(
                lambda xx, spx, wx, bx: spiral_conv_take(
                    xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16),
                (x, sp_j, w, bias))
            t_oh = _timed_grad(
                lambda xx, gx, wx, bx: onehot_conv(
                    xx, gx, s, wx, bx, "elu", compute_dtype=jnp.bfloat16),
                (x, G, w, bias))
            t_fly = _timed_grad(
                lambda xx, spx, wx, bx: spiral_conv_onehot(
                    xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16),
                (x, sp_j, w, bias))
            # correctness cross-check (fwd)
            y1 = spiral_conv_take(x, sp_j, w, bias, "elu",
                                  compute_dtype=jnp.bfloat16)
            y2 = onehot_conv(x, G, s, w, bias, "elu",
                             compute_dtype=jnp.bfloat16)
            err = float(jnp.max(jnp.abs(y1 - y2)))
            rec["by_batch"][str(b)] = {
                "take_ms": round(t_take * 1e3, 3),
                "onehot_ms": round(t_oh * 1e3, 3),
                "onehot_fly_ms": round(t_fly * 1e3, 3),
                "speedup": round(t_take / t_oh, 2),
                "speedup_fly": round(t_take / t_fly, 2),
                "max_abs_err": err,
            }
            print(f"L{lvl} B={b}: take {t_take*1e3:.2f} ms  "
                  f"onehot {t_oh*1e3:.2f} ms ({t_take/t_oh:.2f}x)  "
                  f"fly {t_fly*1e3:.2f} ms ({t_take/t_fly:.2f}x)  "
                  f"err {err:.2e}", flush=True)
        out["levels"].append(rec)
    print(json.dumps(out))


# --- unpool: barycentric 3-gather vs on-the-fly dense-U matmul ---------------

def unpool_dense_hi(x, unpool_idx, unpool_w):
    """unpool_dense with Precision.HIGHEST: the MXU truncates f32 operands
    to bf16 per pass by default (~1.5e-2 abs err on N(0,1) activations);
    HIGHEST runs the 6-pass bf16 expansion that reproduces full f32."""
    import jax
    import jax.numpy as jnp

    b, vc1, c = x.shape
    w = unpool_w.astype(x.dtype)
    U = sum(jax.nn.one_hot(unpool_idx[:, k], vc1, dtype=x.dtype)
            * w[:, k:k + 1] for k in range(unpool_idx.shape[1]))
    xp = jnp.transpose(x, (1, 0, 2)).reshape(vc1, b * c)
    y = jnp.dot(U, xp, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    vf1 = unpool_idx.shape[0]
    return jnp.transpose(y.reshape(vf1, b, c), (1, 0, 2)).astype(x.dtype)


def main_unpool():
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()
    from semantichuman_tpu.ops.sampling import (pool_dense, pool_take,
                                                unpool_dense, unpool_take)
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    hier = MeshHierarchy.load(os.path.join(REPO, "assets",
                                           "topology_synth_full_2222.npz"))
    dec_c = [128, 64, 32, 32]      # decoder channel at each unpool level
    batches = [int(x) for x in
               os.environ.get("SH_TPU_PROBE_B", "4,12").split(",")]
    levels = [int(x) for x in
              os.environ.get("SH_TPU_PROBE_LEVELS", "0,1,2,3").split(",")]
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0].device_kind), "unpool": []}
    for lvl in levels:
        idx = jnp.asarray(np.asarray(hier.unpool_idx[lvl]))
        w = jnp.asarray(np.asarray(hier.unpool_w[lvl], np.float32))
        vf1 = idx.shape[0]
        vc1 = hier.sizes[lvl + 1] + 1
        c = dec_c[::-1][lvl] if lvl < len(dec_c) else 32
        rec = {"level": lvl, "vf1": int(vf1), "vc1": int(vc1), "c": c,
               "by_batch": {}}
        for b in batches:
            x = jnp.asarray(rng.standard_normal((b, vc1, c)), jnp.float32)
            t_take = _timed_grad(
                lambda xx, ix, wx: unpool_take(xx, ix, wx), (x, idx, w))
            t_dense = _timed_grad(
                lambda xx, ix, wx: unpool_dense(xx, ix, wx), (x, idx, w))
            t_hi = _timed_grad(
                lambda xx, ix, wx: unpool_dense_hi(xx, ix, wx), (x, idx, w))
            y1 = unpool_take(x, idx, w)
            y2 = unpool_dense(x, idx, w)
            y3 = unpool_dense_hi(x, idx, w)
            err = float(jnp.max(jnp.abs(y1 - y2)))
            err_hi = float(jnp.max(jnp.abs(y1 - y3)))
            rec["by_batch"][str(b)] = {
                "take_ms": round(t_take * 1e3, 3),
                "dense_ms": round(t_dense * 1e3, 3),
                "dense_hi_ms": round(t_hi * 1e3, 3),
                "speedup": round(t_take / t_dense, 2),
                "speedup_hi": round(t_take / t_hi, 2),
                "max_abs_err": err,
                "max_abs_err_hi": err_hi,
            }
            print(f"unpool L{lvl} B={b}: take {t_take*1e3:.2f} ms  "
                  f"dense {t_dense*1e3:.2f} ms ({t_take/t_dense:.2f}x)  "
                  f"hi {t_hi*1e3:.2f} ms ({t_take/t_hi:.2f}x)  "
                  f"err {err:.2e} hi {err_hi:.2e}", flush=True)
        out["unpool"].append(rec)

    # pool: encoder-side row selection (enc channel at each pool level)
    enc_c = [16, 16, 16, 32]
    for lvl in levels:
        pidx = jnp.asarray(np.asarray(hier.pool_idx[lvl]))
        vf1 = hier.sizes[lvl] + 1
        vc1 = pidx.shape[0]
        c = enc_c[lvl] if lvl < len(enc_c) else 32
        rec = {"level": lvl, "vf1": int(vf1), "vc1": int(vc1), "c": c,
               "by_batch": {}}
        for b in batches:
            x = jnp.asarray(rng.standard_normal((b, vf1, c)), jnp.float32)
            t_take = _timed_grad(lambda xx, ix: pool_take(xx, ix),
                                 (x, pidx))
            t_dense = _timed_grad(
                lambda xx, ix: pool_dense(xx, ix), (x, pidx))
            err = float(jnp.max(jnp.abs(pool_take(x, pidx)
                                        - pool_dense(x, pidx))))
            rec["by_batch"][str(b)] = {
                "take_ms": round(t_take * 1e3, 3),
                "dense_ms": round(t_dense * 1e3, 3),
                "speedup": round(t_take / t_dense, 2),
                "max_abs_err": err,
            }
            print(f"pool L{lvl} B={b}: take {t_take*1e3:.2f} ms  "
                  f"dense {t_dense*1e3:.2f} ms ({t_take/t_dense:.2f}x)  "
                  f"err {err:.2e}", flush=True)
        out.setdefault("pool", []).append(rec)
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("SH_TPU_PROBE_UNPOOL") == "1":
        main_unpool()
    else:
        main()
