"""Host-input-pipeline overlap measurement (VERDICT r1 item 6).

Times the FULL train step at production scale (B=128, bf16 trunk) fed by
the real BatchLoader host pipeline (memmapped source -> normalize ->
dummy append -> H2D), with the threaded prefetch worker ON vs OFF, plus a
device-resident ceiling (same pinned batches every step).

Run on the TPU:  python benchmarks/host_pipeline_bench.py
Prints one JSON line with steps/s for each mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("SH_TPU_BENCH_BATCH", "128"))
STEPS = int(os.environ.get("SH_TPU_BENCH_STEPS", "12"))


def main():
    import jax

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    from __graft_entry__ import _FULL_TOPO, _build
    from semantichuman_tpu.data.dataset import (ArraySource, BatchLoader,
                                                place_batch,
                                                prefetch_to_device)
    from semantichuman_tpu.train.edits import EditSampler
    from semantichuman_tpu.train.optim import make_optimizer
    from semantichuman_tpu.train.step import StepFlags, make_train_step

    cache = _FULL_TOPO if os.path.exists(_FULL_TOPO) else None
    cfg, sh, assets, hier, model, tables = _build(
        cache_path=cache, model_overrides={"trunk_dtype": "bfloat16"})

    n = BATCH * (STEPS + 2)
    print(f"# sampling {n} meshes on host ...", file=sys.stderr)
    meshes = sh.sample_meshes(n, seed=0).astype(np.float32)
    meas = sh.measures(meshes).astype(np.float32)

    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                               cfg.train.lr_decay, steps_per_epoch=1)
    step = make_train_step(model, tables, optimizer, StepFlags(),
                           exc_variant="ori")
    sampler = EditSampler(seed=0)
    spec = sampler.sample_interp(epoch=200, batch_size=BATCH)
    spec = {k: jax.device_put(v) for k, v in spec.items()}

    def loaders():
        src = ArraySource(meshes, meas)
        mk = lambda seed: BatchLoader(  # noqa: E731
            src, BATCH, shuffle=True, seed=seed, drop_last=True,
            normalization="zeroroot",
            j_regressor=assets.j_regressor.astype(np.float32))
        return mk(0), mk(1), mk(2)

    def run(threaded: bool | None | str):
        """threaded=None: device-resident ceiling (pinned batches).
        threaded='resident': the real device-resident pipeline
        (data.device_data gather+normalize per step)."""
        params = model.init(0)
        opt_state = optimizer.init(params)
        main_ld, interp_ld, exc_ld = loaders()
        if threaded == "resident":
            from semantichuman_tpu.data.device_data import (
                DeviceBatchLoader, DeviceDataSource)
            dsrc = DeviceDataSource(
                meshes, meas, "zeroroot",
                j_regressor=assets.j_regressor.astype(np.float32))
            feed = zip(DeviceBatchLoader(main_ld, dsrc),
                       DeviceBatchLoader(interp_ld, dsrc),
                       DeviceBatchLoader(exc_ld, dsrc))
        elif threaded is None:
            b = place_batch(next(iter(main_ld)))
            i = place_batch(next(iter(interp_ld)))
            e = place_batch(next(iter(exc_ld)))
            feed = ((b, i, e) for _ in range(STEPS + 2))
        else:
            main_it = prefetch_to_device(iter(main_ld), size=2,
                                         threaded=threaded)
            interp_it = prefetch_to_device(iter(interp_ld), size=2,
                                           threaded=threaded)
            exc_it = prefetch_to_device(iter(exc_ld), size=2,
                                        threaded=threaded)
            feed = zip(main_it, interp_it, exc_it)

        view = lambda b: {k: b[k] for k in ("verts", "measure") if k in b}  # noqa: E731
        metrics = None
        t0 = None
        k = 0
        for b, i, e in feed:
            params, opt_state, metrics = step(params, opt_state, view(b),
                                              view(i), view(e), spec)
            k += 1
            if k == 2:                       # warmup: compile + first waves
                jax.block_until_ready(metrics)
                t0 = time.perf_counter()
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
        return (k - 2) / dt

    ceiling = run(None)
    resident = run("resident")
    inline = run(False)
    threaded = run(True)
    out = {
        "batch": BATCH,
        "steps_per_sec_pinned_ceiling": round(ceiling, 3),
        "steps_per_sec_device_resident": round(resident, 3),
        "steps_per_sec_inline_pipeline": round(inline, 3),
        "steps_per_sec_threaded_pipeline": round(threaded, 3),
        "resident_vs_threaded": round(resident / threaded, 3),
        "resident_vs_ceiling": round(resident / ceiling, 3),
        "threaded_vs_inline": round(threaded / inline, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
