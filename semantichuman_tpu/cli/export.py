"""Export a trained workdir as an AOT serving bundle.

  python -m semantichuman_tpu.cli.export --config cfg.yaml \
      --workdir results/run1 --out results/run1/bundle --batch_size 64

Produces forward/encode/decode StableHLO artifacts + manifest.json
(see semantichuman_tpu.serving).
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Export a serving bundle.")
    ap.add_argument("--config", default=None)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir (default: <workdir>/checkpoints)")
    ap.add_argument("--out", default=None,
                    help="bundle dir (default: <workdir>/bundle)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args(argv)

    from ..utils.compilation_cache import enable_cache
    enable_cache()

    from ..config import Config
    from ..serving import export_inference
    from ..train.loop import Trainer

    cfg = Config.from_yaml(args.config) if args.config else Config()
    resume = args.resume or os.path.join(args.workdir, "checkpoints")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=resume,
                                       finetune=True))
    if args.synthetic:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, synthetic=True))

    trainer = Trainer(cfg, args.workdir)
    out = args.out or os.path.join(args.workdir, "bundle")
    manifest = export_inference(trainer.model, trainer.params,
                                trainer.assets.j_regressor, out,
                                batch_size=args.batch_size)
    for name, meta in manifest["artifacts"].items():
        print(f"{name}: {meta['file']} (platforms {meta['platforms']})")
    print(f"bundle written to {out}")


if __name__ == "__main__":
    main()
