"""Probe: a fully VERTEX-MAJOR conv trunk at large batch (fwd+bwd, per level).

r2 recorded an unexploited lever (docs/BENCHMARKS.md, memory note): at
B=128 a packed [V1, B*C] `jnp.take` moves the same gathered bytes as the
production batch-major [B, V1, C] layout in 7.1 ms vs ~10 ms (~1.4x) —
each gathered row becomes B*C contiguous elements instead of C, so the
gather engine's ~100 ns/row floor amortizes over 128x wider rows.  The
narrow-channel (C<=4) convs already flip layouts per-call
(ops/spiral_conv.py, 1.39x on the L0 3-channel conv), but the wrap
transposes ([B,V,C] <-> [V,B,C] around every call) were assumed to eat
the win at wider channels, so the trunk stayed batch-major.

This probe measures what a WHOLE-TRUNK adoption would see — activations
resident in [V, B, C] between levels, so no per-conv wrap — against the
production path, per encoder level, fwd+bwd at large batch:

  * batch_major : flat reshape+dot baseline (take + matmul, pre-gather
                  bf16) — the PRE-ADOPTION production conv, kept ungated
                  here since production now dispatches to bm_einsum at
                  c_in >= 64, b >= 32
  * vmaj        : input/output [V1, B, C]; gather rows from [V1, B*C];
                  the (S,B) transpose + [V1*B, S*C] @ W matmul
  * vmaj_einsum : same residency, but the contraction left to XLA as
                  einsum('vsbc,scd->vbd') — no explicit transpose
  * vmaj_wrap   : vmaj plus the [B,V,C]<->[V,B,C] wrap transposes — the
                  per-conv drop-in cost (for reference)

Timing follows the axon rules (chained in-jit grad iterations with a
data dependency, perturbed inputs, scalar fetch — docs/BENCHMARKS.md).

  python benchmarks/vertex_major_trunk_probe.py            # B=128
  SH_TPU_PROBE_B=64 python benchmarks/vertex_major_trunk_probe.py
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


def flat_conv(x, spiral_idx, w, bias, activation="elu",
              compute_dtype=None):
    """Batch-major flat reshape+dot form: the PRE-ADOPTION production conv
    and this probe's baseline.  Kept explicit and ungated here — production
    spiral_conv now dispatches to the einsum form at c_in >= 64, b >= 32
    (this probe's own finding), so measuring the public entry point would
    compare the adopted form against itself."""
    import jax.numpy as jnp

    from semantichuman_tpu.ops.spiral_conv import ACTIVATIONS

    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, v1, c = x.shape
    s = spiral_idx.shape[1]
    g = jnp.take(x, spiral_idx.reshape(-1), axis=1).reshape(b, v1, s * c)
    y = jnp.dot(g, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[:, -1, :].set(0.0)


def vmaj_conv(xt, spiral_idx, w, bias, activation="elu",
              compute_dtype=None, einsum=False):
    """Vertex-major spiral conv: xt [V+1, B, C] -> [V+1, B, C_out]."""
    import jax.numpy as jnp

    from semantichuman_tpu.ops.spiral_conv import ACTIVATIONS

    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        xt = xt.astype(compute_dtype)
        w = w.astype(compute_dtype)
    v1, b, c = xt.shape
    s = spiral_idx.shape[1]
    g = jnp.take(xt, spiral_idx.reshape(-1), axis=0)     # [V1*S, B, C]
    if einsum:
        g4 = g.reshape(v1, s, b, c)
        y = jnp.einsum("vsbc,scd->vbd", g4, w.reshape(s, c, -1),
                       preferred_element_type=jnp.float32)
    else:
        g = g.reshape(v1, s, b, c).transpose(0, 2, 1, 3).reshape(v1, b, s * c)
        y = jnp.dot(g, w, preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[-1, :, :].set(0.0)


def bm_einsum_conv(x, spiral_idx, w, bias, activation="elu",
                   compute_dtype=None):
    """Batch-major einsum form: same gather as the flat baseline, but the
    (S,C) contraction is left to dot_general instead of materializing the
    transposed [B, V1, S*C] copy.  This is the form ADOPTED into production
    (ops/spiral_conv.py, spiral_conv_take's c_in >= 64 branch); kept
    explicit here so the probe measures the form at any shape, bypassing
    the production dispatch gates."""
    import jax.numpy as jnp

    from semantichuman_tpu.ops.spiral_conv import ACTIVATIONS

    act = ACTIVATIONS[activation]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, v1, c = x.shape
    s = spiral_idx.shape[1]
    g = jnp.take(x, spiral_idx.reshape(-1), axis=1)      # [B, V1*S, C]
    y = jnp.einsum("bvsc,scd->bvd", g.reshape(b, v1, s, c),
                   w.reshape(s, c, -1),
                   preferred_element_type=jnp.float32)
    y = act(y + bias.astype(y.dtype))
    return y.at[:, -1, :].set(0.0)


def vmaj_conv_wrapped(x, spiral_idx, w, bias, activation="elu",
                      compute_dtype=None):
    """vmaj_conv with batch-major in/out (the per-conv drop-in form)."""
    import jax.numpy as jnp

    xt = jnp.transpose(x, (1, 0, 2))
    y = vmaj_conv(xt, spiral_idx, w, bias, activation, compute_dtype)
    return jnp.transpose(y, (1, 0, 2))


from benchmarks._timing import timed_grad  # noqa: E402


def _timed_grad(fn, args, iters=ITERS):
    """Shared harness (benchmarks/_timing.py), historical sum-abs reduction."""
    return timed_grad(fn, args, iters, reduction="abs")


def main():
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    hier = MeshHierarchy.load(os.path.join(REPO, "assets",
                                           "topology_synth_full_2222.npz"))
    enc_filters = [3, 16, 32, 64, 128]
    b = int(os.environ.get("SH_TPU_PROBE_B", "128"))
    levels = [int(x) for x in
              os.environ.get("SH_TPU_PROBE_LEVELS", "0,1,2,3,4").split(",")]

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0].device_kind), "batch": b,
           "iters": ITERS, "levels": []}
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
        x = jnp.asarray(rng.standard_normal((b, v1, c_in)), jnp.float32)
        xt = jnp.asarray(np.transpose(np.asarray(x), (1, 0, 2)))

        t_bm = _timed_grad(
            lambda xx, spx, wx, bx: flat_conv(
                xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16),
            (x, sp_j, w, bias))
        t_vm = _timed_grad(
            lambda xx, spx, wx, bx: vmaj_conv(
                xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16),
            (xt, sp_j, w, bias))
        t_ve = _timed_grad(
            lambda xx, spx, wx, bx: vmaj_conv(
                xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16,
                einsum=True),
            (xt, sp_j, w, bias))
        t_vw = _timed_grad(
            lambda xx, spx, wx, bx: vmaj_conv_wrapped(
                xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16),
            (x, sp_j, w, bias))
        t_be = _timed_grad(
            lambda xx, spx, wx, bx: bm_einsum_conv(
                xx, spx, wx, bx, "elu", compute_dtype=jnp.bfloat16),
            (x, sp_j, w, bias))

        rec = {"level": lvl, "v1": int(v1), "s": int(s),
               "c_in": c_in, "c_out": c_out,
               "batch_major_ms": round(t_bm * 1e3, 3),
               "vmaj_ms": round(t_vm * 1e3, 3),
               "vmaj_einsum_ms": round(t_ve * 1e3, 3),
               "vmaj_wrap_ms": round(t_vw * 1e3, 3),
               "bm_einsum_ms": round(t_be * 1e3, 3),
               "vmaj_speedup": round(t_bm / t_vm, 3),
               "vmaj_einsum_speedup": round(t_bm / t_ve, 3),
               "vmaj_wrap_speedup": round(t_bm / t_vw, 3),
               "bm_einsum_speedup": round(t_bm / t_be, 3)}
        out["levels"].append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
