"""Attribute full-step time to its pieces by toggling StepFlags.

Times the jitted train step at the bench shape under several gate
configurations; the deltas attribute wall-time to the interp-edit branch
(the [B, n, n] weighted distance matrices), the exchange branch, and the
rec-only trunk.  Decides where kernel work should go before any refactor.

  python benchmarks/step_breakdown.py [--batch 128 --iters 10]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(step, params, opt_state, args, iters, warmup=2):
    import jax

    p, o = params, opt_state
    for _ in range(warmup):
        p, o, m = step(p, o, *args)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step(p, o, *args)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    import jax

    from __graft_entry__ import _FULL_TOPO, _build, _host_batch
    from semantichuman_tpu.train.edits import EditSampler
    from semantichuman_tpu.train.optim import make_optimizer
    from semantichuman_tpu.train.step import StepFlags, make_train_step

    cache = _FULL_TOPO if os.path.exists(_FULL_TOPO) else None
    cfg, sh, assets, hier, model, tables = _build(
        cache_path=cache, model_overrides={"trunk_dtype": "bfloat16"})
    optimizer = make_optimizer(cfg.train.lr, cfg.train.weight_decay,
                               cfg.train.lr_decay, steps_per_epoch=1)

    b = args.batch
    sampler = EditSampler(seed=0)
    spec = sampler.sample_interp(epoch=200, batch_size=b)
    batch = {k: jax.device_put(v)
             for k, v in _host_batch(sh, b, 0, tables=tables).items()}
    interp = {k: jax.device_put(v)
              for k, v in _host_batch(sh, b, 1, tables=tables).items()}
    exc = {k: jax.device_put(v)
           for k, v in _host_batch(sh, b, 2, tables=tables).items()}
    step_args = (batch, interp, exc, spec)

    configs = {
        "full": StepFlags(),
        "full_jnp_dist": StepFlags(fused_dist=False),
        # same fused 3-segment trunk, distance losses off -> isolates the
        # [B, n, n] weighted-distance work exactly
        "no_dist_loss": StepFlags(interp_euc_w=0.0, exc_euc_w=0.0),
        "no_vol": StepFlags(vol=False),
        "no_interp": StepFlags(interp=False),
        "no_exc": StepFlags(exc=False),
        "rec_edge_zpart_only": StepFlags(interp=False, exc=False),
        "rec_only": StepFlags(interp=False, exc=False, edgereg=False,
                              zpartreg=False),
    }
    out = {"batch": b}
    for name, flags in configs.items():
        step = make_train_step(model, tables, optimizer, flags,
                               exc_variant="ori", donate=False)
        params = model.init(0)
        opt_state = optimizer.init(params)
        dt = timed(step, params, opt_state, step_args, args.iters)
        out[name + "_ms"] = round(dt * 1e3, 1)
        out[name + "_mps"] = round(b / dt, 1)
        print(f"# {name}: {dt * 1e3:.1f} ms", file=sys.stderr, flush=True)

    full, ni, ne, base = (out["full_ms"], out["no_interp_ms"],
                          out["no_exc_ms"], out["rec_edge_zpart_only_ms"])
    out["dist_loss_ms"] = round(full - out["no_dist_loss_ms"], 1)
    out["vol_loss_ms"] = round(full - out["no_vol_ms"], 1)
    out["interp_branch_ms"] = round(full - ni, 1)
    out["exc_branch_ms"] = round(full - ne, 1)
    out["trunk_plus_cheap_losses_ms"] = base
    print(json.dumps(out))


if __name__ == "__main__":
    main()
