"""Serving-path benchmark: exported StableHLO bundles, symbolic vs fixed
batch.

r2 recorded 16.95 ms/call (3776 meshes/s) for the FIXED-batch B=64
artifact.  r3 made export batch-polymorphic by default (serving.py), which
forfeits the vertex-major narrow-channel conv layout (it keys on a
concrete batch >= 32) — this bench measures what that costs, per batch
size, on the real chip:

  python benchmarks/serving_bench.py
  -> one JSON line {"by_batch": {"64": {"symbolic_ms": ..,
     "fixed_ms": ..}, ...}}

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
                os.environ.get("SH_TPU_SERVE_BATCHES", "1,16,64").split(","))


def _timed_call(fn, x, iters=ITERS):
    import jax

    def chain(x0):
        out = None
        x_cur = x0
        for _ in range(iters):
            out = fn(x_cur)
            # data dependency: tiny perturbation of the input from the
            # output (rec has the input's [B, V1, 3] shape) so iterations
            # cannot overlap
            x_cur = x_cur + 1e-12 * out[0]
        return out

    r = chain(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chain(x)
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
    cfg, sh, assets, hier, model, tables = _build(cache_path=cache)
    params = model.init(0)
    v1 = len(assets.template_verts) + 1

    out = {"device": str(jax.devices()[0].device_kind), "by_batch": {}}
    with tempfile.TemporaryDirectory() as tmp:
        sym_dir = os.path.join(tmp, "sym")
        export_inference(model, params, assets.j_regressor, sym_dir,
                         symbolic_batch=True)
        sym = ServingBundle(sym_dir)
        for b in BATCHES:
            fix_dir = os.path.join(tmp, f"fix{b}")
            export_inference(model, params, assets.j_regressor, fix_dir,
                             batch_size=b, symbolic_batch=False)
            fix = ServingBundle(fix_dir)
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal((b, v1, 3)),
                jnp.float32)
            t_sym = _timed_call(sym.forward, x)
            t_fix = _timed_call(fix.forward, x)
            out["by_batch"][str(b)] = {
                "symbolic_ms": round(t_sym * 1e3, 2),
                "fixed_ms": round(t_fix * 1e3, 2),
                "symbolic_meshes_per_s": round(b / t_sym, 1),
                "fixed_meshes_per_s": round(b / t_fix, 1),
            }
            print(f"B={b}: symbolic {t_sym*1e3:.2f} ms  "
                  f"fixed {t_fix*1e3:.2f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
