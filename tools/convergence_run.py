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
import json
import os
import sys
import time

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
    args = ap.parse_args(argv)

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer

    cfg = Config.from_yaml(args.config) if args.config else Config()
    n_epochs = args.epochs or cfg.train.n_epochs
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic=True),
        train=dataclasses.replace(
            cfg.train, n_epochs=n_epochs, save_recons=True,
            **({"seed": args.seed} if args.seed is not None else {})))
    os.makedirs(args.workdir, exist_ok=True)
    curve_path = os.path.join(args.workdir, "curve.jsonl")

    trainer = Trainer(cfg, args.workdir)
    start = trainer.start_epoch
    seg_ends = list(range(start - 1 + args.eval_every, n_epochs + 1,
                          args.eval_every))
    if not seg_ends or seg_ends[-1] != n_epochs:
        # trailing partial segment: --epochs not a multiple of --eval_every
        # must still train (and evaluate) every epoch
        seg_ends.append(n_epochs)
    for seg_end in seg_ends:
        t0 = time.time()
        trainer.fit(seg_end)
        sec = (time.time() - t0) / max(seg_end - trainer.start_epoch + 1, 1)
        trainer.start_epoch = seg_end + 1
        _, _, _, _, l1, mm = trainer.evaluate()
        rec = {"epoch": seg_end, "l1": round(float(l1), 6),
               "mm": round(float(mm), 4), "sec_per_epoch": round(sec, 2)}
        with open(curve_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("CURVE", json.dumps(rec), flush=True)

    trainer.export_predictions()
    print("done:", curve_path)


if __name__ == "__main__":
    main()
