"""Sweep the fast-training recipe's knobs (lr, batch, dtype) on the real
TPU and record each variant's convergence trajectory + time-to-target.

The paper recipe (B=4, lr 1e-3 — reference configure/traincfg.yaml:12,16)
reaches 1.81 mm on the synthetic benchmark in ~21 min; the chip sustains
534 meshes/s at B=128, so a converging large-batch recipe should land the
same error in a small fraction of that wall-clock.  This tool measures
which (lr, batch, dtype) actually does.

Each variant trains in eval segments like tools/convergence_run.py and
appends to <workdir>/<tag>/curve.jsonl plus one summary line per variant to
<workdir>/summary.jsonl:
  {"tag": ..., "best_mm": ..., "epoch_at_target": E|null,
   "sec_to_target": S|null, "total_sec": ...}

  python tools/fast_recipe_sweep.py --workdir results/fast_sweep
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGET_MM = 1.81   # the paper recipe's 300-epoch result (docs/BENCHMARKS.md)


def run_variant(tag: str, workdir: str, lr: float, batch: int, epochs: int,
                lr_decay: float, dtype: str, eval_every: int,
                warmup: int = 0, batch_interp: int | None = None,
                schedule: str = "exp") -> dict:
    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer
    from semantichuman_tpu.train.segments import run_segments

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, trunk_dtype=dtype),
        data=dataclasses.replace(cfg.data, synthetic=True),
        train=dataclasses.replace(
            cfg.train, n_epochs=epochs, lr=lr, lr_decay=lr_decay,
            lr_warmup_epochs=warmup, lr_schedule=schedule,
            batch_train=batch, batch_interp=batch_interp or batch,
            batch_test=64, ck_frequency=10_000, save_recons=False,
            val_every=25, scan_epochs=25))
    wd = os.path.join(workdir, tag)
    os.makedirs(wd, exist_ok=True)
    curve_path = os.path.join(wd, "curve.jsonl")

    trainer = Trainer(cfg, wd)
    t_start = time.time()
    records = run_segments(trainer, epochs, eval_every, curve_path, tag=tag,
                           stop_on_nonfinite=True)
    best_mm = min((r["mm"] for r in records if math.isfinite(r["mm"])),
                  default=float("inf"))
    hit = next((r for r in records if r["mm"] <= TARGET_MM), None)
    epoch_at_target = hit["epoch"] if hit else None
    sec_to_target = hit["elapsed_sec"] if hit else None
    return {"tag": tag, "lr": lr, "batch": batch, "dtype": dtype,
            "warmup": warmup,
            "epochs": epochs, "lr_decay": lr_decay,
            "best_mm": round(best_mm, 4),
            "epoch_at_target": epoch_at_target,
            "sec_to_target": (None if sec_to_target is None
                              else round(sec_to_target, 1)),
            "total_sec": round(time.time() - t_start, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="results/fast_sweep")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--variants", default=None,
                    help="comma list tag=lr:batch:dtype[:decay] overriding "
                         "the default grid")
    args = ap.parse_args(argv)

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    if args.variants:
        # tag=lr:batch:dtype[:decay[:warmup[:batch_interp[:epochs[:sched]]]]]
        grid = []
        for item in args.variants.split(","):
            tag, spec = item.split("=")
            parts = spec.split(":")
            grid.append((tag, float(parts[0]), int(parts[1]), parts[2],
                         float(parts[3]) if len(parts) > 3 else 0.99,
                         int(parts[4]) if len(parts) > 4 else 0,
                         int(parts[5]) if len(parts) > 5 else 0,
                         int(parts[6]) if len(parts) > 6 else 0,
                         parts[7] if len(parts) > 7 else "exp"))
    else:
        # lr 8e-3 measured diverging by epoch 5 without warmup; grid sits
        # below it, with one warmed-up higher-lr probe
        grid = [
            ("b128_lr2e3_bf16", 2e-3, 128, "bfloat16", 0.99, 0, 0, 0,
             "exp"),
            ("b128_lr4e3_w10_bf16", 4e-3, 128, "bfloat16", 0.99, 10, 0, 0,
             "exp"),
            ("b128_lr1e3_bf16", 1e-3, 128, "bfloat16", 0.99, 0, 0, 0,
             "exp"),
        ]

    os.makedirs(args.workdir, exist_ok=True)
    summary_path = os.path.join(args.workdir, "summary.jsonl")
    for (tag, lr, batch, dtype, decay, warmup, b_interp, v_epochs,
         sched) in grid:
        try:
            rec = run_variant(tag, args.workdir, lr, batch,
                              v_epochs or args.epochs,
                              decay, dtype, args.eval_every, warmup=warmup,
                              batch_interp=b_interp or None,
                              schedule=sched)
        except Exception as e:  # record and continue the sweep
            rec = {"tag": tag, "error": repr(e)}
        with open(summary_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("SUMMARY", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
