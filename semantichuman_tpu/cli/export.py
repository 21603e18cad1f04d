"""Export a trained workdir as an AOT serving bundle.

  python -m semantichuman_tpu.cli.export --config cfg.yaml \
      --workdir results/run1 --out results/run1/bundle --batch_size 64

Produces forward/encode/decode StableHLO artifacts + manifest.json
(see semantichuman_tpu.serving).  Needs only the assets, the topology
cache, and a checkpoint — NOT the training dataset, so it runs on a
serving host that never saw the data.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Export a serving bundle.")
    ap.add_argument("--config", default=None)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir (default: <workdir>/checkpoints)")
    ap.add_argument("--out", default=None,
                    help="bundle dir (default: <workdir>/bundle)")
    ap.add_argument("--batch_size", type=int, default=64,
                    help="fallback fixed batch (artifacts are "
                         "batch-polymorphic unless --fixed_batch)")
    ap.add_argument("--fixed_batch", action="store_true",
                    help="export fixed-batch artifacts instead of "
                         "symbolic-batch ones")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--trunk_dtype", default=None,
                    choices=("float32", "bfloat16"),
                    help="serving numeric policy override (default: the "
                         "config's trunk_dtype).  Checkpoints are "
                         "dtype-independent — params stay f32, the bf16 "
                         "trunk is a runtime cast — so an f32-trained "
                         "checkpoint exports to a bf16 bundle directly")
    args = ap.parse_args(argv)

    from ..utils.compilation_cache import enable_cache
    enable_cache()

    from ..config import Config
    from ..data.assets import BodyAssets
    from ..models import build_model
    from ..serving import export_inference
    from ..topology import compile_topology
    from ..utils.checkpoint import restore_checkpoint

    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.trunk_dtype:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           trunk_dtype=args.trunk_dtype))
    if args.synthetic or cfg.data.synthetic:
        assets, _sh = BodyAssets.synthetic(
            n_theta=cfg.data.synthetic_n_theta,
            n_phi=cfg.data.synthetic_n_phi)
    else:
        assets = BodyAssets.load(
            cfg.data.asset_dir,
            os.path.join(cfg.data.root_dir, "template", "template.obj"))

    m = cfg.model
    tag = "".join(str(f) for f in m.ds_factors)
    ref_vertex = min(414, len(assets.template_verts) - 1)
    if cfg.data.reference_hierarchy:
        # MUST use the same hierarchy the checkpoint was trained against
        from ..topology.reference_import import (
            check_template_match, hierarchy_from_reference_pickle)
        hier = hierarchy_from_reference_pickle(
            cfg.data.reference_hierarchy, step_sizes=m.step_sizes,
            dilation=m.dilation, reference_vertex=ref_vertex,
            cache_path=os.path.join(args.workdir,
                                    f"topology_ref_{tag}.npz"))
        check_template_match(hier, assets.template_verts)
    else:
        hier = compile_topology(
            assets.template_verts, assets.template_faces,
            ds_factors=m.ds_factors, step_sizes=m.step_sizes,
            dilation=m.dilation, reference_vertex=ref_vertex,
            cache_path=os.path.join(args.workdir, f"topology_{tag}.npz"))
    model = build_model(cfg, hier, assets.part_dict)

    resume = args.resume or os.path.join(args.workdir, "checkpoints")
    state, step = restore_checkpoint(resume)   # raw numpy pytree
    print(f"restored checkpoint at epoch {state.get('epoch', step)}")

    out = args.out or os.path.join(args.workdir, "bundle")
    manifest = export_inference(model, state["params"],
                                assets.j_regressor, out,
                                batch_size=args.batch_size,
                                symbolic_batch=not args.fixed_batch)
    for name, meta in manifest["artifacts"].items():
        print(f"{name}: {meta['file']} (platforms {meta['platforms']})")
    print(f"bundle written to {out}")


if __name__ == "__main__":
    main()
