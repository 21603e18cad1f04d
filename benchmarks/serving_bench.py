"""Serving-path benchmark: exported StableHLO bundles — numeric policy
(f32 vs bf16 trunk) and symbolic-vs-fixed batch.

r2 recorded 16.95 ms/call (3776 meshes/s) for the FIXED-batch B=64
artifact; r3 made export batch-polymorphic by default and measured the
cost (~1 % at B=64, a wash at B<=16).  Those artifacts ran the f32
trunk — but the forward is gather/HBM-bound, and the TRAINING headline
already ships the bf16-trunk numeric policy (pre-gather cast halves the
dominant traffic).  r5 closes the gap: this bench A/Bs the exported
serving bundle at both trunk dtypes, per batch size, on the real chip:

  python benchmarks/serving_bench.py
  -> one JSON line {"by_batch": {"64": {"f32_ms": .., "bf16_ms": ..,
     "bf16_meshes_per_s": .., "speedup": ..}, ...},
     "decode_by_batch": {...}, "delta_vs_f32_mm": {...}}

`decode_by_batch` times the decode-only artifact (the latent-editing
service's hot path: edit z/z_kps on host, decode on chip).
`delta_vs_f32_mm` is the max/mean per-vertex L2 distance between the
bf16 and f32 forward reconstructions (x1000 = mm at human scale) on the
same inputs — the random-init numeric spread; the trained-checkpoint
accuracy delta is measured by tools/serving_accuracy.py.

SH_TPU_SERVE_FIXED=1 re-enables the r3 symbolic-vs-fixed comparison
(answered: ~1 % at B=64; kept reproducible).

Timing: many-iteration loops chained through a data dependency
(docs/BENCHMARKS.md timing note for the axon remote platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = int(os.environ.get("SH_TPU_SERVE_ITERS", "20"))
BATCHES = tuple(int(b) for b in
                os.environ.get("SH_TPU_SERVE_BATCHES",
                               "1,16,64,128,256").split(","))
FIXED_AB = os.environ.get("SH_TPU_SERVE_FIXED") == "1"


def _timed_forward(fn, x, iters=ITERS):
    import jax

    def chain(x0):
        out = None
        x_cur = x0
        for _ in range(iters):
            out = fn(x_cur)
            # data dependency: tiny perturbation of the input from the
            # output (rec has the input's [B, V1, 3] shape) so iterations
            # cannot overlap or hit the platform result cache
            x_cur = x_cur + 1e-12 * out[0]
        return out

    r = chain(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chain(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def _timed_decode(fn, z, zk, iters=ITERS):
    """decode: (z [B,P,nz], z_kps [B,P,nk]) -> verts [B,V,3]; chain by
    perturbing z with a scalar reduced from the output."""
    import jax
    import jax.numpy as jnp

    def chain(z0):
        out = None
        z_cur = z0
        for _ in range(iters):
            out = fn(z_cur, zk)
            z_cur = z_cur + 1e-12 * jnp.mean(out)
        return out

    r = chain(z)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chain(z)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    from __graft_entry__ import _FULL_TOPO, _build
    from semantichuman_tpu.serving import ServingBundle, export_inference

    cache = _FULL_TOPO if os.path.exists(_FULL_TOPO) else None

    bundles = {}
    with tempfile.TemporaryDirectory() as tmp:
        for dt in ("float32", "bfloat16"):
            cfg, sh, assets, hier, model, tables = _build(
                cache_path=cache, model_overrides={"trunk_dtype": dt})
            params = model.init(0)   # same seed -> identical f32 params
            d = os.path.join(tmp, dt)
            export_inference(model, params, assets.j_regressor, d,
                             symbolic_batch=True)
            bundles[dt] = ServingBundle(d)
        v1 = len(assets.template_verts) + 1
        nz, nk = model.latent_size, model.kps_latent_size
        p = model.n_parts

        out = {"device": str(jax.devices()[0].device_kind),
               "by_batch": {}, "decode_by_batch": {},
               "delta_vs_f32_mm": {}}
        rng = np.random.default_rng(0)
        for b in BATCHES:
            x = jnp.asarray(rng.standard_normal((b, v1, 3)), jnp.float32)
            t32 = _timed_forward(bundles["float32"].forward, x)
            t16 = _timed_forward(bundles["bfloat16"].forward, x)
            out["by_batch"][str(b)] = {
                "f32_ms": round(t32 * 1e3, 2),
                "bf16_ms": round(t16 * 1e3, 2),
                "f32_meshes_per_s": round(b / t32, 1),
                "bf16_meshes_per_s": round(b / t16, 1),
                "speedup": round(t32 / t16, 2),
            }
            z = jnp.asarray(rng.standard_normal((b, p, nz)), jnp.float32)
            zk = jnp.asarray(rng.standard_normal((b, p, nk)), jnp.float32)
            d32 = _timed_decode(bundles["float32"].decode, z, zk)
            d16 = _timed_decode(bundles["bfloat16"].decode, z, zk)
            out["decode_by_batch"][str(b)] = {
                "f32_ms": round(d32 * 1e3, 2),
                "bf16_ms": round(d16 * 1e3, 2),
                "bf16_meshes_per_s": round(b / d16, 1),
                "speedup": round(d32 / d16, 2),
            }
            r32 = np.asarray(bundles["float32"].forward(x)[0])
            r16 = np.asarray(bundles["bfloat16"].forward(x)[0])
            dist = np.linalg.norm(r16 - r32, axis=-1) * 1e3
            out["delta_vs_f32_mm"][str(b)] = {
                "max": round(float(dist.max()), 4),
                "mean": round(float(dist.mean()), 4),
            }
            print(f"B={b}: fwd f32 {t32*1e3:.2f} ms  bf16 {t16*1e3:.2f} ms "
                  f"({t32/t16:.2f}x)  dec f32 {d32*1e3:.2f}  "
                  f"bf16 {d16*1e3:.2f}", flush=True)

        if FIXED_AB:
            out["fixed_vs_symbolic"] = {}
            for b in BATCHES:
                fix_dir = os.path.join(tmp, f"fix{b}")
                export_inference(model, params, assets.j_regressor,
                                 fix_dir, batch_size=b,
                                 symbolic_batch=False)
                fix = ServingBundle(fix_dir)
                x = jnp.asarray(rng.standard_normal((b, v1, 3)),
                                jnp.float32)
                t_fix = _timed_forward(fix.forward, x)
                t_sym = _timed_forward(bundles["bfloat16"].forward, x)
                out["fixed_vs_symbolic"][str(b)] = {
                    "symbolic_ms": round(t_sym * 1e3, 2),
                    "fixed_ms": round(t_fix * 1e3, 2),
                }
                print(f"B={b}: symbolic {t_sym*1e3:.2f} ms  "
                      f"fixed {t_fix*1e3:.2f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
