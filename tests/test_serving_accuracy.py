"""tools/serving_accuracy.py config recovery: the synthetic test split is
seeded by cfg.train.seed, so the tool must rebuild the RUN'S config from
its train_params.txt dump (first JSON object; resumed runs append more)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "serving_accuracy", os.path.join(REPO, "tools",
                                         "serving_accuracy.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_config_roundtrip_with_appended_dumps(tmp_path):
    from semantichuman_tpu.config import Config
    import dataclasses

    tool = _load_tool()
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, seed=7))
    # mirror Trainer._dump_train_params exactly (cfg.to_dict + default=str)
    dump = json.loads(json.dumps(
        {"git_sha": "x", "start_epoch": 1, "config": cfg.to_dict()},
        default=str))
    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    # a resumed run appends a second dump after the first JSON object
    with open(ckpt / "train_params.txt", "w") as f:
        json.dump(dump, f, indent=2)
        f.write("\n")
        json.dump({"resumed": True}, f)
    got = tool._run_config(str(ckpt), None)
    assert got.train.seed == 7
    assert got.model.trunk_dtype == cfg.model.trunk_dtype


def test_run_config_missing_raises(tmp_path):
    tool = _load_tool()
    with pytest.raises(FileNotFoundError, match="train_params"):
        tool._run_config(str(tmp_path / "nope"), None)
