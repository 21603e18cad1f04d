"""Measure what the bf16-trunk serving policy costs in accuracy, on a
TRAINED checkpoint: run the full test-set eval (reference
test_funcs.py:61-110 metrics) at trunk_dtype float32 vs bfloat16 with
the same restored params, and report both mm numbers + the delta.

The random-init numeric spread is already printed by
benchmarks/serving_bench.py (delta_vs_f32_mm); this tool is the
trained-weights ground truth behind the docs/BENCHMARKS.md serving
claim.

  python tools/serving_accuracy.py \
      --resume results/convergence300_r5full/checkpoints
-> one JSON line {"f32_mm": .., "bf16_mm": .., "delta_mm": ..,
                  "f32_l1": .., "bf16_l1": ..}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run_config(resume: str, config: str | None):
    """Reproduce the trained run's config: the synthetic test split is
    seeded by cfg.train.seed (train/loop.py _setup_data), so evaluating a
    checkpoint on the RIGHT test set requires the run's own config — read
    it back from the train_params.txt the Trainer dumps next to the
    checkpoints (first JSON object; later dumps may be appended)."""
    from semantichuman_tpu.config import Config

    if config:
        return Config.from_yaml(config)
    for d in (resume, os.path.dirname(resume.rstrip("/"))):
        p = os.path.join(d, "train_params.txt")
        if os.path.exists(p):
            with open(p) as f:
                obj, _end = json.JSONDecoder().raw_decode(f.read())
            return Config.from_dict(obj["config"])
    raise FileNotFoundError(
        f"no train_params.txt next to {resume}; pass --config explicitly")


def _eval_at(cfg, resume: str, trunk_dtype: str):
    from semantichuman_tpu.train.loop import Trainer

    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, trunk_dtype=trunk_dtype),
        train=dataclasses.replace(cfg.train, resume=resume,
                                  resume_torch=None))
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, wd)
        _p, _z, _zk, _tx, l1, mm = trainer.evaluate()
    return l1, mm


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--resume", required=True,
                    help="checkpoint dir of a trained run")
    ap.add_argument("--config", default=None,
                    help="YAML config the run was trained with (default: "
                         "auto-read from the run's train_params.txt)")
    args = ap.parse_args(argv)

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    cfg = _run_config(args.resume, args.config)
    out = {}
    for dt, tag in (("float32", "f32"), ("bfloat16", "bf16")):
        l1, mm = _eval_at(cfg, args.resume, dt)
        out[f"{tag}_l1"] = round(l1, 6)
        out[f"{tag}_mm"] = round(mm, 4)
        print(f"{dt}: l1 {l1:.6f}  mm {mm:.4f}", flush=True)
    out["delta_mm"] = round(out["bf16_mm"] - out["f32_mm"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
