"""End-to-end CLI pipeline smoke test on a tiny synthetic dataset:
make_synthetic -> obj2npy -> data_generation -> train -> demo
(the reference's obj2npy.py / data_generation.py / main.py / demo.py flow)."""

import os

import numpy as np
import pytest

from semantichuman_tpu.cli import (data_generation, demo, make_synthetic,
                                   obj2npy, train)

CFG = """
model:
  filter_sizes_enc: [[3, 8, 8, 16, 16], [[], [], [], [], []]]
  filter_sizes_dec: [[16, 16, 8, 8, 8], [[], [], [], [], 3]]
  use_pallas: false
data:
  root_dir: {root}
  asset_dir: {root}/asset
  normalization: zeroroot
  measure: true
train:
  n_epochs: 1
  batch_train: 4
  batch_interp: 4
  batch_test: 4
  ck_frequency: 1
"""


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    """Run the full CLI chain once; both tests consume its artifacts, so
    each is independently runnable."""
    base = str(tmp_path_factory.mktemp("cli"))
    _run_pipeline(base)
    return base


def _run_pipeline(pipeline_dir):
    root = os.path.join(pipeline_dir, "ds")

    make_synthetic.main(["--out_dir", root, "--n_train", "12",
                         "--n_test", "4", "--n_theta", "12",
                         "--n_phi", "24"])
    assert os.path.exists(os.path.join(root, "asset", "J_regressor.npy"))

    obj2npy.main(["--save_path", root,
                  "--trainobj_path", os.path.join(root, "obj_train"),
                  "--testobj_path", os.path.join(root, "obj_test"),
                  "--asset_dir", os.path.join(root, "asset")])
    train_npy = np.load(os.path.join(root, "preprocessed", "train.npy"))
    assert train_npy.shape[0] == 12 and train_npy.shape[2] == 3
    meas = np.load(os.path.join(root, "preprocessed",
                                "train_measurements.npy"))
    assert meas.shape == (12, 32)
    assert np.all(meas > 0)

    data_generation.main(["-r", root, "--n_val", "2"])
    for split, n in (("train", 10), ("val", 2), ("test", 4)):
        names = np.load(os.path.join(root, "preprocessed",
                                     f"paths_{split}.npy"))
        assert len(names) == n

    cfg_path = os.path.join(pipeline_dir, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root))
    workdir = os.path.join(pipeline_dir, "run")
    train.main(["--config", cfg_path, "--workdir", workdir])
    assert os.path.exists(os.path.join(workdir, "predictions",
                                       "predictions.npy"))
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert any(c.isdigit() for c in ckpts), ckpts

    demo.main(["--config", cfg_path, "--workdir", workdir, "--skip_eval",
               "--n_samples", "2"])
    edits = os.listdir(os.path.join(workdir, "edits"))
    assert {"sample0_rec.obj", "sample0_girth.obj", "sample0_style.obj",
            "sample0_ori.obj", "sample0_bonelen.obj"} <= set(edits)

    from semantichuman_tpu.cli import export
    export.main(["--config", cfg_path, "--workdir", workdir,
                 "--batch_size", "2"])
    bundle = os.path.join(workdir, "bundle")
    assert os.path.exists(os.path.join(bundle, "manifest.json"))
    from semantichuman_tpu.serving import ServingBundle
    import jax.numpy as jnp
    served = ServingBundle(bundle)
    v1 = served.manifest["n_vertices"] + 1
    rec, z, zk = served.forward(jnp.zeros((2, v1, 3), jnp.float32))
    assert rec.shape == (2, v1, 3)


def test_full_cli_pipeline(pipeline_dir):
    """Artifact assertions over the chain the fixture ran."""
    root = os.path.join(pipeline_dir, "ds")
    workdir = os.path.join(pipeline_dir, "run")
    assert os.path.exists(os.path.join(workdir, "predictions",
                                       "predictions.npy"))
    assert os.path.exists(os.path.join(workdir, "bundle", "manifest.json"))


def test_export_needs_no_dataset(pipeline_dir):
    """Serving export must work on a host with only assets, template, and a
    checkpoint — no preprocessed/ dataset (runs after the pipeline test)."""
    import shutil
    src_root = os.path.join(pipeline_dir, "ds")
    src_work = os.path.join(pipeline_dir, "run")
    host = os.path.join(pipeline_dir, "serving_host")
    os.makedirs(os.path.join(host, "ds", "template"), exist_ok=True)
    shutil.copytree(os.path.join(src_root, "asset"),
                    os.path.join(host, "ds", "asset"))
    shutil.copy(os.path.join(src_root, "template", "template.obj"),
                os.path.join(host, "ds", "template", "template.obj"))
    work = os.path.join(host, "work")
    os.makedirs(work)
    shutil.copytree(os.path.join(src_work, "checkpoints"),
                    os.path.join(work, "checkpoints"))

    cfg_path = os.path.join(host, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=os.path.join(host, "ds")))
    from semantichuman_tpu.cli import export
    export.main(["--config", cfg_path, "--workdir", work,
                 "--batch_size", "2"])
    assert os.path.exists(os.path.join(work, "bundle", "manifest.json"))


def test_eval_reference_checkpoint(pipeline_dir, capsys):
    """North-star harness mechanics end-to-end (VERDICT r1 item 2b): save a
    torch .pth.tar in the reference's checkpoint format, evaluate it in
    torch (the reference's test_funcs.py:61-110 recipe), then run
    cli.eval_reference and require the imported-model metrics to match the
    torch numbers within the 0.5% north-star budget."""
    import json

    torch = pytest.importorskip("torch")
    from benchmarks.torch_baseline import (build_torch_model,
                                           reference_state_dict)
    from semantichuman_tpu.cli import eval_reference
    from semantichuman_tpu.constants import KPS_INDEX_LIST, KPS_KEEP
    from semantichuman_tpu.data.assets import BodyAssets
    from semantichuman_tpu.topology import compile_topology

    root = os.path.join(pipeline_dir, "ds")
    assets = BodyAssets.load(os.path.join(root, "asset"),
                             os.path.join(root, "template", "template.obj"))
    hier = compile_topology(
        assets.template_verts, assets.template_faces,
        reference_vertex=min(414, len(assets.template_verts) - 1))
    coarse = hier.downsample_part_indices(assets.part_dict)
    torch.manual_seed(3)
    torch_model = build_torch_model(
        hier, coarse, KPS_INDEX_LIST,
        enc_filters=[3, 8, 8, 16, 16], dec_filters=[16, 16, 8, 8, 8])
    ckpt = os.path.join(pipeline_dir, "checkpoint42.pth.tar")
    torch.save({"epoch": 42,
                "autoencoder_state_dict": reference_state_dict(torch_model),
                "optimizer_state_dict": {},
                "scheduler_state_dict": {}}, ckpt)

    # --- the reference's own eval recipe, in torch --------------------------
    test_v = np.load(os.path.join(root, "preprocessed",
                                  "test.npy")).astype(np.float32)
    jr = assets.j_regressor.astype(np.float32)
    root_j = np.einsum("v,bvd->bd", jr[0], test_v)
    xn = np.nan_to_num(test_v - root_j[:, None, :])       # zeroroot
    x = np.concatenate([xn, np.zeros((len(xn), 1, 3), np.float32)], axis=1)
    kps = np.einsum("jv,bvd->bjd", jr, xn)[:, KPS_KEEP]
    with torch.no_grad():
        rec = torch_model(torch.as_tensor(x), torch.as_tensor(kps))[0].numpy()
    d = rec[:, :-1] - x[:, :-1]
    t_l1 = float(np.mean(np.abs(d)))
    t_mm = float(np.mean(np.sqrt(np.sum((d * 1000.0) ** 2, axis=2))))

    # --- one-command harness -------------------------------------------------
    cfg_path = os.path.join(pipeline_dir, "eval_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root))
    rc = eval_reference.main([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--workdir", os.path.join(pipeline_dir, "ref_eval"),
        "--batch_test", "4",
        "--torch_l1", str(t_l1), "--torch_mm", str(t_mm),
        "--max_delta_pct", "0.5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, out
    assert out["epoch"] == 42
    assert abs(out["mm_delta_pct"]) < 0.5
    assert abs(out["l1_delta_pct"]) < 0.5


def test_train_resume_torch(pipeline_dir):
    """cli.train --resume_torch: continue TRAINING from a reference
    .pth.tar carrying optimizer + scheduler state (main.py:277-292) — the
    run must start at epoch+1 with the imported Adam moments and finish."""
    torch = pytest.importorskip("torch")
    from benchmarks.torch_baseline import (build_torch_model,
                                           reference_state_dict)
    from semantichuman_tpu.constants import KPS_INDEX_LIST, KPS_KEEP
    from semantichuman_tpu.data.assets import BodyAssets
    from semantichuman_tpu.topology import compile_topology

    root = os.path.join(pipeline_dir, "ds")
    assets = BodyAssets.load(os.path.join(root, "asset"),
                             os.path.join(root, "template", "template.obj"))
    hier = compile_topology(
        assets.template_verts, assets.template_faces,
        reference_vertex=min(414, len(assets.template_verts) - 1))
    coarse = hier.downsample_part_indices(assets.part_dict)
    torch.manual_seed(5)
    torch_model = build_torch_model(
        hier, coarse, KPS_INDEX_LIST,
        enc_filters=[3, 8, 8, 16, 16], dec_filters=[16, 16, 8, 8, 8])

    # a couple of real Adam steps so the checkpoint carries moments
    opt = torch.optim.Adam(torch_model.parameters(), lr=1e-3,
                           weight_decay=5e-5)
    jr = assets.j_regressor.astype(np.float32)
    v = np.load(os.path.join(root, "preprocessed",
                             "train.npy"))[:4].astype(np.float32)
    v = np.nan_to_num(v - np.einsum("v,bvd->bd", jr[0], v)[:, None, :])
    x = torch.as_tensor(np.concatenate(
        [v, np.zeros((4, 1, 3), np.float32)], axis=1))
    kps = torch.as_tensor(
        np.einsum("jv,bvd->bjd", jr, v)[:, KPS_KEEP].astype(np.float32))
    for _ in range(2):
        opt.zero_grad()
        rec = torch_model(x, kps)[0]
        torch.mean(torch.abs(rec - x)).backward()
        opt.step()

    ckpt = os.path.join(pipeline_dir, "resume1.pth.tar")
    torch.save({"epoch": 1,
                "autoencoder_state_dict": reference_state_dict(torch_model),
                "optimizer_state_dict": opt.state_dict(),
                "scheduler_state_dict": {"gamma": 0.99, "last_epoch": 1}},
               ckpt)

    cfg_path = os.path.join(pipeline_dir, "cfg.yaml")
    workdir = os.path.join(pipeline_dir, "resume_run")
    train.main(["--config", cfg_path, "--workdir", workdir,
                "--resume_torch", ckpt, "--epochs", "2"])
    assert os.path.exists(os.path.join(workdir, "predictions",
                                       "predictions.npy"))
    # resumed at epoch 2: exactly the epoch-2 checkpoint exists
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert "2" in ckpts and "1" not in ckpts, ckpts


def test_convergence_runner_smoke(tmp_path):
    """tools/convergence_run.py drives segmented fit + eval + curve.jsonl
    end-to-end on the small config."""
    import json
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.convergence_run import main as conv_main

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "train_synthetic_small.yaml")
    wd = str(tmp_path / "conv")
    conv_main(["--workdir", wd, "--config", cfg_path,
               "--epochs", "2", "--eval_every", "1", "--seed", "7"])
    lines = [json.loads(l) for l in open(os.path.join(wd, "curve.jsonl"))]
    assert [r["epoch"] for r in lines] == [1, 2]
    assert all("mm" in r and r["mm"] > 0 for r in lines)
    assert os.path.exists(os.path.join(wd, "predictions", "predictions.npy"))
    # --seed overrides cfg.train.seed (multi-seed robustness study knob);
    # train_params.txt is the provenance JSON + appended final metrics
    raw = open(os.path.join(wd, "checkpoints", "train_params.txt")).read()
    params, _ = json.JSONDecoder().raw_decode(raw)
    assert params["config"]["train"]["seed"] == 7


def test_fast_recipe_config_smoke(tmp_path):
    """configs/train_fast.yaml (the TPU fast-training recipe) must load and
    drive the full trainer machinery it claims — scan_epochs chunking,
    val_every, warmup+schedule, bf16/f32 trunk — end-to-end at toy scale."""
    import dataclasses

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer

    cfg = Config.from_yaml(os.path.join(os.path.dirname(__file__), "..",
                                        "configs", "train_fast.yaml"))
    t = cfg.train
    assert t.batch_train >= 64 and t.scan_epochs > 1
    # shrink to CPU scale, keep every recipe mechanism on
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            filter_sizes_enc=[[3, 8, 8, 16, 16], [[], [], [], [], []]],
            filter_sizes_dec=[[16, 16, 8, 8, 8], [[], [], [], [], 3]],
            use_pallas=False, trunk_dtype="float32"),
        data=dataclasses.replace(
            cfg.data, synthetic=True, synthetic_train=16, synthetic_test=8,
            synthetic_n_theta=16, synthetic_n_phi=36),
        train=dataclasses.replace(
            t, n_epochs=4, batch_train=8, batch_interp=4, batch_test=8,
            ck_frequency=4, save_recons=False))
    tr = Trainer(cfg, str(tmp_path))
    assert tr._epoch_scan_ok()
    tr.fit()
    assert tr.global_step == 4 * len(tr.train_loader)
    assert np.isfinite(tr.validate())


def test_train_cli_config_overrides(monkeypatch, tmp_path):
    """--epochs must land on cfg.train.n_epochs (the cosine schedule is
    built from it in Trainer.__init__, not from fit()'s argument), and an
    explicit CLI resume flag must replace the config's resume PAIR so a
    yaml train.resume cannot trip the resume-xor-resume_torch check."""
    from semantichuman_tpu.cli import train as T
    from semantichuman_tpu.train import loop as L

    captured = {}

    class FakeTrainer:
        def __init__(self, cfg, workdir):
            captured["cfg"] = cfg

        def fit(self, n_epochs=None):
            captured["fit_n"] = n_epochs

        def export_predictions(self):
            return (None, None, None, None, 0.0, 0.0)

    monkeypatch.setattr(L, "Trainer", FakeTrainer)

    cfgfile = tmp_path / "cfg.yaml"
    cfgfile.write_text(
        "train:\n  n_epochs: 1600\n  resume: /stale/orbax/dir\n")

    T.main(["--workdir", str(tmp_path / "w"), "--config", str(cfgfile),
            "--epochs", "7", "--resume_torch", "ck.pth.tar",
            "--synthetic"])
    cfg = captured["cfg"]
    assert cfg.train.n_epochs == 7
    assert captured["fit_n"] is None        # fit() reads cfg.train.n_epochs
    assert cfg.train.resume is None         # CLI flag replaced the pair
    assert cfg.train.resume_torch == "ck.pth.tar"

    # no CLI resume flags: the yaml's resume survives --finetune
    T.main(["--workdir", str(tmp_path / "w2"), "--config", str(cfgfile),
            "--finetune", "--synthetic"])
    cfg = captured["cfg"]
    assert cfg.train.resume == "/stale/orbax/dir"
    assert cfg.train.finetune


def test_dfaust_drill_stages(pipeline_dir, capsys):
    """tools/dfaust_drill.py first-contact drill: the no-data stages
    (assets -> topology -> import) run in order off a reference-layout
    .pth.tar, the topology compiled with the --config model knobs (the
    Trainer's own protocol, train/loop.py:103-107); a checkpoint whose
    part layout mismatches fails the drill AT the import stage, rc 1."""
    import json

    torch = pytest.importorskip("torch")
    from benchmarks.torch_baseline import (build_torch_model,
                                           reference_state_dict)
    from semantichuman_tpu.constants import KPS_INDEX_LIST
    from semantichuman_tpu.data.assets import BodyAssets
    from semantichuman_tpu.topology import compile_topology
    from tools.dfaust_drill import main as drill_main

    root = os.path.join(pipeline_dir, "ds")
    asset_dir = os.path.join(root, "asset")
    template = os.path.join(root, "template", "template.obj")
    assets = BodyAssets.load(asset_dir, template)
    hier = compile_topology(
        assets.template_verts, assets.template_faces,
        reference_vertex=min(414, len(assets.template_verts) - 1))
    coarse = hier.downsample_part_indices(assets.part_dict)
    torch.manual_seed(5)
    tm = build_torch_model(hier, coarse, KPS_INDEX_LIST,
                           enc_filters=[3, 8, 8, 16, 16],
                           dec_filters=[16, 16, 8, 8, 8])
    ckpt = os.path.join(pipeline_dir, "drill_ckpt.pth.tar")
    torch.save({"epoch": 5,
                "autoencoder_state_dict": reference_state_dict(tm),
                "optimizer_state_dict": {}, "scheduler_state_dict": {}},
               ckpt)
    cfg_path = os.path.join(pipeline_dir, "drill_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG.format(root=root))

    rc = drill_main(["--asset_dir", asset_dir, "--template", template,
                     "--checkpoint", ckpt, "--config", cfg_path,
                     "--workdir", os.path.join(pipeline_dir, "drill")])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert rec["drill"] == "ok"
    assert set(rec["stages"]) == {"assets", "topology", "import"}

    # part-layout mismatch -> fails AT the import stage, not before/after
    sd = reference_state_dict(tm)
    w = sd["fc_latent_enc_list.0.weight"]
    sd["fc_latent_enc_list.0.weight"] = torch.cat([w, w], dim=1)
    bad = os.path.join(pipeline_dir, "drill_bad.pth.tar")
    torch.save({"epoch": 5, "autoencoder_state_dict": sd,
                "optimizer_state_dict": {}, "scheduler_state_dict": {}},
               bad)
    rc = drill_main(["--asset_dir", asset_dir, "--template", template,
                     "--checkpoint", bad, "--config", cfg_path,
                     "--workdir", os.path.join(pipeline_dir, "drill_bad")])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert rec["stages"]["import"] == "FAILED"
    assert rec["stages"]["topology"] != "FAILED"
