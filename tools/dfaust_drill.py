"""DFAUST first-contact drill: the command sequence for the day real data
lands, as one script.

Given the real artifacts —

  --asset_dir    dir with J_regressor.npy, vert_part_index_dict.npy,
                 factor_list.npy, edge_point_index_list.npy
                 (+ optionally edge_verts_index.npy)
                 (the reference asset contract, configure/cfgs.py:55-59)
  --template     template.obj (the registered template mesh)
  --checkpoint   a reference .pth.tar (train_funcs.py:450-455 layout)
  --data_root    (optional) DFAUST root with preprocessed/{train,test}.npy
                 — enables the eval and resume stages

— runs, in order, stopping at the first failure with the failing stage
named:

  1. assets    : BodyAssets.load with full shape/dtype validation
                 (hostile-dtype coercion: sparse J_regressor, object
                 arrays — data/assets.py)
  2. topology  : compile_topology on the real template (cached)
  3. import    : checkpoint import + a jitted forward on the imported
                 params (utils/import_torch.py)
  4. eval      : cli.eval_reference full test-set metrics   [needs data]
  5. demo      : cli.demo edits off the imported checkpoint [needs data]
  6. resume    : cli.train --resume_torch for 1 epoch       [needs data]

  python tools/dfaust_drill.py --asset_dir data/DFAUST/asset \
      --template data/DFAUST/template/template.obj \
      --checkpoint checkpoint300.pth.tar --data_root data/DFAUST \
      --workdir results/dfaust_drill
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset_dir", required=True)
    ap.add_argument("--template", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--workdir", default="results/dfaust_drill")
    ap_config_default = "configs/train_dfaust.yaml"
    ap.add_argument("--config", default=ap_config_default,
                    help="model config matching the checkpoint layout")
    args = ap.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    results = {}

    def stage(name, fn):
        print(f"=== stage: {name} ===", flush=True)
        try:
            results[name] = fn() or "ok"
            print(f"    {name}: OK", flush=True)
            return True
        except Exception:
            traceback.print_exc()
            results[name] = "FAILED"
            print(f"!!! drill FAILED at stage {name!r}", flush=True)
            return False

    state = {}

    def s_assets():
        from semantichuman_tpu.data.assets import BodyAssets
        a = BodyAssets.load(args.asset_dir, args.template)
        state["assets"] = a
        return (f"V={len(a.template_verts)} joints={a.j_regressor.shape[0]} "
                f"parts={len(a.part_dict)} girths={len(a.girth_edges)}")

    def s_topology():
        from semantichuman_tpu.config import Config
        from semantichuman_tpu.topology import compile_topology
        # the checkpoint's layout is defined by the config's topology knobs
        # (ds_factors/step_sizes/dilation) — compile with THEM, as the
        # Trainer does (train/loop.py:103-107), or s_import sees a hierarchy
        # the checkpoint was never trained on
        if os.path.exists(args.config):
            cfg = Config.from_yaml(args.config)
        elif args.config == ap_config_default:
            # the cwd-relative default may simply not exist yet; say so
            # instead of silently compiling a mismatched hierarchy
            print(f"note: default config {args.config!r} not found -> "
                  "compiling with library-default topology knobs",
                  flush=True)
            cfg = Config()
        else:
            raise FileNotFoundError(
                f"--config {args.config!r} does not exist (the topology "
                "must be compiled with the checkpoint's own model knobs)")
        state["cfg"] = cfg
        a = state["assets"]
        h = compile_topology(
            a.template_verts, a.template_faces,
            ds_factors=cfg.model.ds_factors,
            step_sizes=cfg.model.step_sizes,
            dilation=cfg.model.dilation,
            reference_vertex=min(414, len(a.template_verts) - 1),
            cache_path=os.path.join(args.workdir, "topology.npz"))
        state["hier"] = h
        return f"sizes={list(h.sizes)}"

    def s_import():
        import jax
        import jax.numpy as jnp
        import numpy as np

        from semantichuman_tpu.constants import KPS_KEEP
        from semantichuman_tpu.models import build_model
        from semantichuman_tpu.utils.import_torch import (
            load_reference_checkpoint)
        cfg = state["cfg"]
        a = state["assets"]
        model = build_model(cfg, state["hier"], a.part_dict)
        params, epoch = load_reference_checkpoint(args.checkpoint, model)
        v1 = len(a.template_verts) + 1
        x = np.zeros((1, v1, 3), np.float32)
        x[0, :-1] = a.template_verts
        kps = np.einsum("jv,bvd->bjd", a.j_regressor.astype(np.float32),
                        x[:, :-1])[:, KPS_KEEP]
        rec = jax.jit(model)(params, jnp.asarray(x), jnp.asarray(kps))[0]
        assert np.all(np.isfinite(np.asarray(rec)))
        return f"epoch={epoch} forward finite"

    ok = (stage("assets", s_assets) and stage("topology", s_topology)
          and stage("import", s_import))

    if ok and args.data_root:
        cfg_path = os.path.join(args.workdir, "drill_cfg.yaml")
        raw = {}
        if os.path.exists(args.config):
            import yaml
            with open(args.config) as f:
                raw = yaml.safe_load(f) or {}
        raw.setdefault("data", {})
        raw["data"]["root_dir"] = args.data_root
        raw["data"]["asset_dir"] = args.asset_dir
        raw["data"]["synthetic"] = False
        with open(cfg_path, "w") as f:
            import yaml
            yaml.safe_dump(raw, f)

        def s_eval():
            from semantichuman_tpu.cli import eval_reference
            rc = eval_reference.main([
                "--config", cfg_path, "--checkpoint", args.checkpoint,
                "--workdir", os.path.join(args.workdir, "eval")])
            assert rc == 0
        ok = stage("eval", s_eval)

        def s_demo():
            from semantichuman_tpu.cli import demo
            demo.main(["--config", cfg_path,
                       "--workdir", os.path.join(args.workdir, "demo"),
                       "--checkpoint_torch", args.checkpoint,
                       "--skip_eval", "--n_samples", "1"])
        ok = ok and stage("demo", s_demo)

        def s_resume():
            from semantichuman_tpu.cli import train as train_cli
            import torch
            epoch = int(torch.load(args.checkpoint, map_location="cpu",
                                   weights_only=False).get("epoch", 0))
            train_cli.main(["--config", cfg_path,
                            "--workdir", os.path.join(args.workdir,
                                                      "resume"),
                            "--resume_torch", args.checkpoint,
                            "--epochs", str(epoch + 1)])
        ok = ok and stage("resume", s_resume)
    elif ok:
        print("(no --data_root: eval/demo/resume stages skipped)")

    print(json.dumps({"drill": "ok" if ok else "failed",
                      "stages": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
