"""Trainer integration tests: short synthetic-data runs end-to-end."""

import os

import numpy as np
import pytest

from semantichuman_tpu.config import Config
from semantichuman_tpu.train.loop import Trainer
from tests.conftest import SMALL_MODEL_OVERRIDES


def make_cfg(tmp, **train_overrides):
    return Config.from_dict({
        "model": dict(SMALL_MODEL_OVERRIDES),
        "data": {"synthetic": True, "synthetic_train": 16,
                 "synthetic_test": 8, "normalization": "zeroroot"},
        "train": {"n_epochs": 2, "batch_train": 4, "batch_interp": 4,
                  "batch_test": 4, "ck_frequency": 2, "log_every": 0,
                  **train_overrides},
    })


@pytest.fixture(scope="module")
def small_assets(small_human):
    from semantichuman_tpu.data.assets import BodyAssets
    from semantichuman_tpu.topology.adjacency import unique_edges
    assets = BodyAssets(
        template_verts=small_human.template_verts,
        template_faces=small_human.template_faces,
        j_regressor=small_human.J_regressor,
        part_dict=small_human.part_dict,
        girth_edges=small_human.girth_edges,
        girth_factors=small_human.girth_factors,
        edge_verts=unique_edges(small_human.template_faces))
    return assets


def _small_trainer(tmp, small_assets, small_human, **overrides):
    cfg = make_cfg(tmp, **overrides)
    from semantichuman_tpu.data.dataset import ArraySource
    train = small_human.sample_meshes(16, seed=0).astype(np.float32)
    test = small_human.sample_meshes(8, seed=1).astype(np.float32)
    data = {"train": ArraySource(train,
                                 small_human.measures(train).astype(
                                     np.float32)),
            "val": ArraySource(test), "test": ArraySource(test)}
    return Trainer(cfg, tmp, assets=small_assets, data=data)


def test_fit_and_eval(tmp_path, small_assets, small_human):
    tr = _small_trainer(str(tmp_path), small_assets, small_human)
    tr.fit()
    assert tr.global_step == 2 * len(tr.train_loader)
    val = tr.validate()
    assert np.isfinite(val)
    preds, z, z_kps, tx, l1, l2 = tr.export_predictions()
    n_test = 8
    assert preds.shape[0] == n_test and tx.shape[0] == n_test
    assert z.shape == (n_test, 17, 8) and z_kps.shape == (n_test, 17, 8)
    assert np.isfinite(l1) and np.isfinite(l2)
    # artifacts on disk
    pdir = os.path.join(str(tmp_path), "predictions")
    for f in ("predictions.npy", "z_s.npy", "z_kps_s.npy", "tx_s.npy"):
        assert os.path.exists(os.path.join(pdir, f))
    assert os.path.exists(os.path.join(str(tmp_path), "summaries",
                                       "metrics.jsonl"))
    # checkpoint written at ck_frequency
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoints", "2"))


def test_resume_roundtrip(tmp_path, small_assets, small_human):
    tmp1 = str(tmp_path / "a")
    tr = _small_trainer(tmp1, small_assets, small_human)
    tr.fit()
    w0 = np.asarray(tr.params["conv"][0]["w"])
    # resume into a fresh trainer and confirm weights carry over
    tmp2 = str(tmp_path / "b")
    tr2 = _small_trainer(tmp2, small_assets, small_human,
                         resume=os.path.join(tmp1, "checkpoints"))
    np.testing.assert_allclose(np.asarray(tr2.params["conv"][0]["w"]), w0,
                               atol=1e-7)
    assert tr2.start_epoch == 3
    # finetune mode restarts the schedule but keeps weights
    tmp3 = str(tmp_path / "c")
    tr3 = _small_trainer(tmp3, small_assets, small_human,
                         resume=os.path.join(tmp1, "checkpoints"),
                         finetune=True)
    assert tr3.start_epoch == 1
    np.testing.assert_allclose(np.asarray(tr3.params["conv"][0]["w"]), w0,
                               atol=1e-7)


def test_eval_unnormalized_metrics_gass(tmp_path, small_assets):
    """Under 'gass' normalization, evaluate() reports TRUE-millimeter
    metrics by inverting the per-vertex std/mean scaling (VERDICT r1 item
    7; the reference's unnormal is defined at test_funcs.py:9-15 but its
    unnormal_flag is dead, so its printed mm stays in normalized space)."""
    import dataclasses
    cfg = make_cfg(str(tmp_path))
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, normalization="zeroroot_gass",
        synthetic_n_theta=16, synthetic_n_phi=36))
    t = Trainer(cfg, str(tmp_path), assets=small_assets)

    preds_u, _, _, tx_u, l1_u, mm_u = t.evaluate()            # auto: unnorm
    preds_n, _, _, tx_n, l1_n, mm_n = t.evaluate(unnormalize=False)

    # hand-invert the normalized outputs and recompute the metric
    rec = preds_n[:, :-1] * t.stats.std + t.stats.mean
    gt = tx_n[:, :-1] * t.stats.std + t.stats.mean
    d = rec - gt
    mm_manual = float(np.mean(np.sqrt(np.sum((d * 1000.0) ** 2, axis=2))))
    l1_manual = float(np.mean(np.abs(d)))
    assert np.isclose(mm_u, mm_manual, rtol=1e-5)
    assert np.isclose(l1_u, l1_manual, rtol=1e-5)
    # the normalized-space metric is a genuinely different number
    assert not np.isclose(mm_u, mm_n, rtol=1e-3)
    # returned arrays are unnormalized too (dummy row untouched)
    np.testing.assert_allclose(preds_u[:, :-1], rec, rtol=1e-5)
    np.testing.assert_allclose(preds_u[:, -1], preds_n[:, -1], rtol=1e-6)


def test_baseline_model_trains(tmp_path, small_assets, small_human):
    tr = _small_trainer(str(tmp_path), small_assets, small_human)
    cfg = make_cfg(str(tmp_path / "n3dmm"))
    cfg = Config.from_dict({**cfg.to_dict(),
                            "model": dict(SMALL_MODEL_OVERRIDES,
                                          model_type="neural3DMM", nz=32)})
    from semantichuman_tpu.data.dataset import ArraySource
    train = small_human.sample_meshes(8, seed=0).astype(np.float32)
    data = {"train": ArraySource(train), "val": ArraySource(train[:4]),
            "test": ArraySource(train[:4])}
    tr2 = Trainer(cfg, str(tmp_path / "n3dmm"), assets=small_assets,
                  data=data)
    tr2.fit(n_epochs=1)
    assert tr2.global_step == len(tr2.train_loader)


def test_seeded_runs_reproduce(tmp_path, small_assets, small_human):
    """Same seed -> identical training trajectory (the reference seeds
    random/np/torch/cudnn, main.py:76-82; here one seed drives data order,
    init, and the edit sampler)."""
    import dataclasses
    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer
    from tests.conftest import SMALL_MODEL_OVERRIDES

    def run(tag):
        cfg = Config.from_dict({
            "model": dict(SMALL_MODEL_OVERRIDES),
            "data": {"synthetic": True, "synthetic_train": 16,
                     "synthetic_test": 8, "synthetic_n_theta": 16,
                     "synthetic_n_phi": 36, "normalization": "No"},
            "train": {"n_epochs": 1, "batch_train": 4, "batch_interp": 4,
                      "batch_test": 8, "ck_frequency": 100}})
        t = Trainer(cfg, str(tmp_path / tag), assets=small_assets)
        t.fit()
        return t.validate()

    assert run("a") == run("b")


def test_checkpoint_retention(tmp_path):
    from semantichuman_tpu.utils.checkpoint import (latest_step,
                                                    save_checkpoint)
    state = {"x": np.ones(3)}
    for step in (1, 2, 3, 4):
        save_checkpoint(str(tmp_path), step, state, max_to_keep=2)
    import os
    kept = sorted(int(d) for d in os.listdir(tmp_path) if d.isdigit())
    assert kept == [3, 4]
    assert latest_step(str(tmp_path)) == 4


@pytest.mark.parametrize("overrides", [
    {},                                                     # default ori_or_m
    {"edit_mode": "rand", "editskl_flag": True,             # skl stacking +
     "log_every": 3},                                       # per-step logging
    {"edit_mode": "exc"},                                   # host-measure specs
], ids=["default", "rand_editskl_logevery", "exc_measures"])
def test_epoch_scan_matches_step_loop(tmp_path, small_assets, small_human,
                                      overrides):
    """The whole-epoch lax.scan path must reproduce the per-step loop
    exactly: same batch/spec schedule (shared seeded RNG draw order), same
    params and epoch losses after 2 epochs — including the 'ori_or_m'
    per-step variant coin flips riding as traced exc_is_ori flags."""
    import jax

    tr_scan = _small_trainer(str(tmp_path / "scan"), small_assets,
                             small_human, **overrides)
    tr_loop = _small_trainer(str(tmp_path / "loop"), small_assets,
                             small_human, epoch_scan=False, **overrides)
    assert tr_scan._epoch_scan_ok(), "scan prerequisites not met in test env"
    assert not tr_loop._epoch_scan_ok()

    tr_scan.fit(2)
    tr_loop.fit(2)
    assert tr_scan.global_step == tr_loop.global_step

    ps = jax.tree.leaves(tr_scan.params)
    pl = jax.tree.leaves(tr_loop.params)
    for a, b in zip(ps, pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    vs, vl = tr_scan.validate(), tr_loop.validate()
    np.testing.assert_allclose(vs, vl, rtol=1e-5)


def test_scan_epoch_chunking_matches_per_epoch(tmp_path, small_assets,
                                               small_human):
    """Fusing N epochs into one scan dispatch (train.scan_epochs) must be
    trajectory-identical to one dispatch per epoch — the chunk builder
    replays exactly the per-epoch schedule/RNG construction."""
    import jax

    tr_1 = _small_trainer(str(tmp_path / "chunk1"), small_assets,
                          small_human)
    tr_n = _small_trainer(str(tmp_path / "chunkN"), small_assets,
                          small_human, scan_epochs=3, val_every=4)
    assert tr_1._epoch_scan_ok() and tr_n._epoch_scan_ok()

    tr_1.fit(4)
    tr_n.fit(4)
    assert tr_1.global_step == tr_n.global_step

    for a, b in zip(jax.tree.leaves(tr_1.params),
                    jax.tree.leaves(tr_n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(tr_1.validate(), tr_n.validate(), rtol=1e-5)
    # chunking must still honor checkpoint boundaries (ck_frequency=2
    # inside a 3-epoch chunk clips the chunk)
    assert os.path.exists(os.path.join(str(tmp_path), "chunkN",
                                       "checkpoints", "2"))
    assert os.path.exists(os.path.join(str(tmp_path), "chunkN",
                                       "checkpoints", "4"))


def test_scan_chunk_end_boundaries():
    """The chunk builder must treat the chunk's FIRST epoch as a potential
    host-action boundary too: a chunk that crossed one would save a
    checkpoint labeled with the boundary epoch but holding end-of-chunk
    params, and silently skip the boundary's validation (fit() validates
    only at chunk end).  Epochs are picked above every default *_epoch
    loss-gate threshold so flags_for_epoch is constant across the probes."""
    import dataclasses
    from types import SimpleNamespace

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer

    def end(e0, **kw):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **kw))
        return Trainer._scan_chunk_end(
            SimpleNamespace(cfg=cfg), e0, 1000)

    common = dict(scan_epochs=4, ck_frequency=5, val_every=1000,
                  save_recons=False)
    # a chunk starting ON a ck boundary must end there (1-epoch chunk)
    assert end(105, **common) == 105
    # otherwise extend to the scan limit / clip AT the next boundary
    assert end(106, **common) == 109
    assert end(107, **common) == 110
    # default val_every=1: every epoch needs a val pass -> chunks never fuse
    assert end(101, scan_epochs=4, ck_frequency=1000,
               save_recons=False) == 101
    # sample-dump epochs (save_recons, multiples of 50) are boundaries too
    assert end(150, scan_epochs=4, ck_frequency=1000, val_every=1000,
               save_recons=True) == 150
    assert end(148, scan_epochs=4, ck_frequency=1000, val_every=1000,
               save_recons=True) == 150


def test_run_segments_protocol(tmp_path):
    """The shared segment runner (train/segments.py): seg_ends cover the
    whole budget including a trailing partial segment, each segment evals
    once and appends one JSON curve line, start_epoch is bumped past each
    segment, and stop_on_nonfinite aborts after a NaN eval."""
    import json

    from semantichuman_tpu.train.segments import run_segments

    class FakeTrainer:
        def __init__(self, mms):
            self.start_epoch = 1
            self.fits = []
            self.mms = list(mms)

        def fit(self, seg_end):
            self.fits.append((self.start_epoch, seg_end))

        def evaluate(self):
            mm = self.mms.pop(0)
            return None, None, None, None, mm / 1000.0, mm

    curve = os.path.join(tmp_path, "curve.jsonl")
    tr = FakeTrainer([5.0, 4.0, 3.0])
    recs = run_segments(tr, 25, 10, curve)
    # 25 epochs at eval_every=10 -> segments ending 10, 20, 25 (partial)
    assert tr.fits == [(1, 10), (11, 20), (21, 25)]
    assert [r["epoch"] for r in recs] == [10, 20, 25]
    assert tr.start_epoch == 26
    lines = [json.loads(l) for l in open(curve)]
    assert [l["mm"] for l in lines] == [5.0, 4.0, 3.0]
    assert all("elapsed_sec" in r and "elapsed_sec" not in l
               for r, l in zip(recs, lines))

    # a resumed trainer (start_epoch mid-budget) only trains the remainder
    tr2 = FakeTrainer([2.0])
    tr2.start_epoch = 21
    recs2 = run_segments(tr2, 25, 10, os.path.join(tmp_path, "c2.jsonl"))
    assert tr2.fits == [(21, 25)] and [r["epoch"] for r in recs2] == [25]

    # stop_on_nonfinite: NaN mm aborts the remaining segments
    tr3 = FakeTrainer([5.0, float("nan"), 1.0])
    recs3 = run_segments(tr3, 30, 10, os.path.join(tmp_path, "c3.jsonl"),
                         stop_on_nonfinite=True)
    assert len(recs3) == 2 and tr3.fits == [(1, 10), (11, 20)]
