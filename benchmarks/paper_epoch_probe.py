"""Attribute the paper-recipe epoch wall (B=4, 64 steps) to its pieces.

The r5 B=4 step breakdown (results/r5_tpu/b4_breakdown.out) measured the
isolated chained step at 25.1 ms while the real training epoch logs
2.2 s/epoch = 34.4 ms/step — a ~0.59 s/epoch gap that sits OUTSIDE the
compiled step.  This probe splits one production epoch (the exact
_run_scan_chunk machinery, synthetic full-scale data, device-resident)
into:

  host_build_s   — per-epoch schedule/edit-spec construction (numpy RNG,
                   stacking) exactly as _run_scan_chunk builds it
  put_s          — device_put of the stacked schedules
  dispatch_s     — the step() call returning (async dispatch cost)
  device_s       — from dispatch return to the loss fetch completing
                   (device execution + result transfer)
  total_s        — sum; compare against the logged 2.2 s/epoch

  python benchmarks/paper_epoch_probe.py [--epochs 4]

Prints one JSON line per measured epoch plus a summary line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4,
                    help="measured epochs (after 2 warm-up/compile epochs)")
    args = ap.parse_args()

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    import jax

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, synthetic=True),
        train=dataclasses.replace(cfg.train, n_epochs=300))
    tr = Trainer(cfg, os.path.join("results", "_epoch_probe"))
    assert tr._epoch_scan_ok(), "probe requires the production scan path"

    # warm-up: compile the scan program through the real fit path
    for e in (1, 2):
        tr._run_scan_chunk(e, e)

    out = []
    for e in range(3, 3 + args.epochs):
        # --- replicate _run_scan_chunk's host section, timed -------------
        t0 = time.perf_counter()
        src = tr.train_loader.source
        exc_dyn = tr.sampler.exc_mode == "ori_or_m"
        host_meas = getattr(tr.interp_loader.loader.source, "measures",
                            None)
        metas, idx_in, idx_ex, specs = [], [], [], []
        tr.train_loader.set_epoch(e)
        tr.sampler.reseed(e)
        interp_meta_iter = tr.interp_loader.meta_cycle(anchor=e)
        e_metas = list(tr.train_loader.loader.iter_indices())
        metas.extend(e_metas)
        variant = None
        for _ in range(len(e_metas)):
            mi = next(interp_meta_iter)
            me = next(interp_meta_iter)
            idx_in.append(mi["global_idx"])
            idx_ex.append(me["global_idx"])
            variant = tr.sampler.sample_exc_variant()
            measure = None
            if cfg.train.edit_mode == "exc":
                measure = np.asarray(host_meas)[mi["global_idx"]]
            spec = tr.sampler.sample_interp(e, len(mi["global_idx"]),
                                            measure=measure)
            if exc_dyn:
                spec["exc_is_ori"] = np.float32(variant == "ori")
            specs.append(spec)
        k = len(metas)
        idx_tr = np.stack([m["global_idx"] for m in metas]).astype(np.int32)
        idx_in = np.stack(idx_in).astype(np.int32)
        idx_ex = np.stack(idx_ex).astype(np.int32)
        specs_st = {n: np.stack([s[n] for s in specs]) for n in specs[0]}
        t1 = time.perf_counter()

        import jax.numpy as jnp
        dev = {
            "idx_tr": jnp.asarray(idx_tr), "idx_in": jnp.asarray(idx_in),
            "idx_ex": jnp.asarray(idx_ex),
            "specs": {n: jnp.asarray(v) for n, v in specs_st.items()},
        }
        jax.block_until_ready(dev["idx_tr"])
        t2 = time.perf_counter()

        step = tr._get_scan_step(e, "dynamic" if exc_dyn else variant, k)
        tr.params, tr.opt_state, ms = step(
            tr.params, tr.opt_state, src.verts, src.measures, src.gt,
            dev["idx_tr"], dev["idx_in"], dev["idx_ex"], dev["specs"])
        t3 = time.perf_counter()
        loss = float(np.asarray(jax.device_get(ms["loss"])).mean())
        t4 = time.perf_counter()

        rec = dict(epoch=e, steps=k,
                   host_build_s=round(t1 - t0, 4),
                   put_s=round(t2 - t1, 4),
                   dispatch_s=round(t3 - t2, 4),
                   device_s=round(t4 - t3, 4),
                   total_s=round(t4 - t0, 4),
                   per_step_ms=round((t4 - t0) / k * 1e3, 2),
                   device_per_step_ms=round((t4 - t3) / k * 1e3, 2),
                   loss=round(loss, 6))
        print(json.dumps(rec), flush=True)
        out.append(rec)

    med = {kk: float(np.median([r[kk] for r in out]))
           for kk in ("host_build_s", "put_s", "dispatch_s", "device_s",
                      "total_s", "per_step_ms", "device_per_step_ms")}
    print(json.dumps({"median": med}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
