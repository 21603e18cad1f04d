"""Run the paper recipe (300 epochs, batch 4 — traincfg.yaml:12,16 in the
reference) to convergence on the full-scale synthetic SMPL-like dataset,
recording the test-set mm-error trajectory.

Trains in segments of --eval_every epochs; after each segment runs the full
test eval (reference test_funcs.py:61-110 metrics) and appends one JSON line
{"epoch": E, "l1": ..., "mm": ..., "sec_per_epoch": ...} to
<workdir>/curve.jsonl.  Finishes with prediction export.

  python tools/convergence_run.py --workdir results/convergence300
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="results/convergence300")
    ap.add_argument("--config", default=None,
                    help="YAML config (default: full-scale synthetic)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override cfg.train.n_epochs (default: the "
                         "config's budget — fixed-budget recipes like "
                         "train_fast.yaml anneal their cosine lr over it)")
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=None,
                    help="override cfg.train.seed (init + data order) — "
                         "the multi-seed robustness study runs the same "
                         "recipe at --seed 2/3/4")
    ap.add_argument("--banded", type=int, choices=(0, 1), default=None,
                    help="override cfg.model.banded_conv (the r5 banded "
                         "convergence-validation runs re-run a pinned "
                         "recipe with banding forced on/off)")
    args = ap.parse_args(argv)

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer
    from semantichuman_tpu.train.segments import run_segments

    cfg = Config.from_yaml(args.config) if args.config else Config()
    n_epochs = args.epochs or cfg.train.n_epochs
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic=True),
        model=dataclasses.replace(
            cfg.model,
            **({"banded_conv": bool(args.banded)}
               if args.banded is not None else {})),
        train=dataclasses.replace(
            cfg.train, n_epochs=n_epochs, save_recons=True,
            **({"seed": args.seed} if args.seed is not None else {})))
    os.makedirs(args.workdir, exist_ok=True)
    curve_path = os.path.join(args.workdir, "curve.jsonl")

    trainer = Trainer(cfg, args.workdir)
    run_segments(trainer, n_epochs, args.eval_every, curve_path)
    trainer.export_predictions()
    print("done:", curve_path)


if __name__ == "__main__":
    main()
