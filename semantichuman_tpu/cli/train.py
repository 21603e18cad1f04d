"""Training entry point (reference main.py parity).

  python -m semantichuman_tpu.cli.train --config configs/train_dfaust.yaml \
      --workdir results/run1 [--epochs N]

Runs the full pipeline: topology compile (cached in the workdir), model +
loss tables, epoch loop with checkpoints, final eval + prediction export.
"""

from __future__ import annotations

import argparse
import dataclasses


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a SemanticHuman-TPU model.")
    ap.add_argument("--config", default=None,
                    help="YAML config (defaults mirror the reference recipe)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override cfg.train.n_epochs")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to resume from")
    ap.add_argument("--resume_torch", default=None,
                    help="reference .pth.tar to resume from (weights + "
                         "Adam moments + schedule position)")
    ap.add_argument("--finetune", action="store_true",
                    help="with --resume/--resume_torch: load weights only "
                         "and restart the schedule from epoch 1")
    ap.add_argument("--synthetic", action="store_true",
                    help="force the synthetic dataset (no DFAUST needed)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: run jax.distributed.initialize before "
                         "any backend use (auto-detected coordinator on TPU "
                         "pods, or --coordinator/--num_processes/"
                         "--process_id for manual bring-up)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (multi-host)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.distributed or args.coordinator:
        # must precede every jax backend touch (including enable_cache)
        from ..parallel.distributed import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    from ..utils.compilation_cache import enable_cache
    enable_cache()

    from ..config import Config
    from ..train.loop import Trainer

    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.synthetic:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, synthetic=True))
    if args.epochs is not None:
        # set it on the CONFIG (not just fit()): the lr schedule — cosine
        # anneals over the full n_epochs budget — is built in
        # Trainer.__init__ from cfg.train.n_epochs
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, n_epochs=args.epochs))
    if args.resume or args.resume_torch or args.finetune:
        # an explicit CLI resume flag replaces the config's resume PAIR
        # wholesale — otherwise a yaml with train.resume set would trip
        # the resume-xor-resume_torch check with no CLI way to clear it
        if args.resume or args.resume_torch:
            resume, resume_torch = args.resume, args.resume_torch
        else:
            resume, resume_torch = cfg.train.resume, cfg.train.resume_torch
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, resume=resume, resume_torch=resume_torch,
                finetune=args.finetune or cfg.train.finetune))

    trainer = Trainer(cfg, args.workdir)
    trainer.fit()
    if cfg.train.eval_flag:
        _p, _z, _zk, _tx, l1, l2mm = trainer.export_predictions()
        print(f"test L1: {l1:.6f}")
        print(f"test per-vertex euclidean (mm): {l2mm:.4f}")


if __name__ == "__main__":
    main()
