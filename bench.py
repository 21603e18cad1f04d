"""Headline benchmark: training-step throughput at full DFAUST scale.

Times the flagship part-aware spiral autoencoder's FULL jitted training step
(forward, every loss branch — rec, edge regularizer, z-part measure reg,
interp-edit branch with orientation-adaptive weighted distance loss, skeleton
exchange branch with volume loss — backward, Adam) on ~6890-vertex
SMPL-topology meshes, and prints ONE JSON line:

  {"metric": "train_meshes_per_sec_per_chip", "value": N, "unit": "meshes/s",
   "vs_baseline": N / <PyTorch-CPU meshes/s of the reference recipe>}

The baseline denominator is benchmarks/torch_baseline.py — the reference's
own computational recipe (dense D/U matmuls, per-part Linear loops,
train_funcs.py-style step) measured on this host's CPU and cached in
benchmarks/torch_cpu_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("SH_TPU_BENCH_BATCH", "128"))
ITERS = int(os.environ.get("SH_TPU_BENCH_ITERS", "20"))
WARMUP = int(os.environ.get("SH_TPU_BENCH_WARMUP", "3"))


def main():
    import jax

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    from __graft_entry__ import _FULL_TOPO, _build, _host_batch
    from semantichuman_tpu.constants import KPS_INDEX_LIST, KPS_KEEP
    from semantichuman_tpu.train.edits import EditSampler
    from semantichuman_tpu.train.optim import make_optimizer
    from semantichuman_tpu.train.step import StepFlags, make_train_step

    cache = _FULL_TOPO if os.path.exists(_FULL_TOPO) else None
    # production numeric policy: bf16 conv trunk (the pre-gather cast halves
    # the dominant HBM traffic; losses stay fp32 — loss trace matches the
    # fp32 trunk to 6 decimals under --xla_allow_excess_precision)
    dtype = os.environ.get("SH_TPU_BENCH_DTYPE", "bfloat16")
    cfg, sh, assets, hier, model, tables = _build(
        cache_path=cache, model_overrides={"trunk_dtype": dtype})

    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                               cfg.train.lr_decay, steps_per_epoch=1)
    params = model.init(0)
    opt_state = optimizer.init(params)
    step = make_train_step(model, tables, optimizer, StepFlags(),
                           exc_variant="ori")

    sampler = EditSampler(seed=0)
    edit_spec = sampler.sample_interp(epoch=200, batch_size=BATCH)
    batch = {k: jax.device_put(v)
             for k, v in _host_batch(sh, BATCH, seed=0).items()}
    interp = {k: jax.device_put(v)
              for k, v in _host_batch(sh, BATCH, seed=1).items()}
    exc = {k: jax.device_put(v)
           for k, v in _host_batch(sh, BATCH, seed=2).items()}

    for _ in range(WARMUP):
        params, opt_state, metrics = step(params, opt_state, batch, interp,
                                          exc, edit_spec)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, metrics = step(params, opt_state, batch, interp,
                                          exc, edit_spec)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    mps = BATCH * ITERS / dt

    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # --- PyTorch-CPU reference-recipe denominator ---------------------------
    vs = None
    try:
        from benchmarks.torch_baseline import get_or_measure
        coarse_parts = hier.downsample_part_indices(assets.part_dict)
        verts = sh.sample_meshes(4, seed=0)
        base = get_or_measure(hier, coarse_parts, KPS_INDEX_LIST,
                              assets.j_regressor, KPS_KEEP, verts)
        vs = mps / base["meshes_per_sec"]
    except Exception as e:  # torch baseline is best-effort
        print(f"# torch baseline unavailable: {e}", file=sys.stderr)

    out = {"metric": "train_meshes_per_sec_per_chip",
           "value": round(mps, 2), "unit": "meshes/s",
           "vs_baseline": round(vs, 2) if vs is not None else None}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
