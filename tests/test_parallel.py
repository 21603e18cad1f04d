"""Data-parallel correctness: the SAME training step over an 8-device mesh
must produce the same losses and parameter updates as a single device
(SURVEY.md §7.2 step 5 — loss-curve equivalence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semantichuman_tpu.models import build_model
from semantichuman_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             replicated_sharding)
from semantichuman_tpu.train import losses as L
from semantichuman_tpu.train.edits import EditSampler
from semantichuman_tpu.train.optim import make_optimizer
from semantichuman_tpu.train.step import StepFlags, make_train_step


@pytest.fixture(scope="module")
def setup(small_cfg, small_hierarchy, small_human):
    model = build_model(small_cfg, small_hierarchy, small_human.part_dict)
    tables = L.build_loss_tables(small_human.template_faces,
                                 small_human.J_regressor,
                                 small_human.part_dict)
    opt = make_optimizer(1e-3, 5e-5, 0.99, steps_per_epoch=1)
    params = model.init(0)

    def host_batch(seed):
        b = 8
        v = small_human.sample_meshes(b, seed=seed).astype(np.float32)
        return {"verts": np.concatenate(
                    [v, np.zeros((b, 1, 3), np.float32)], axis=1),
                "measure": small_human.measures(v).astype(np.float32)}

    spec = EditSampler(seed=0).sample_interp(epoch=200, batch_size=8)
    return model, tables, opt, params, host_batch, spec


def _run(setup, devices):
    model, tables, opt, params, host_batch, spec = setup
    mesh = make_mesh(devices)
    bshard = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt.init(params), rep)
    step = make_train_step(model, tables, opt, StepFlags(),
                           exc_variant="ori", donate=False)
    metrics_seq = []
    for i in range(3):
        batch = {k: jax.device_put(v, bshard)
                 for k, v in host_batch(i).items()}
        interp = {k: jax.device_put(v, bshard)
                  for k, v in host_batch(100 + i).items()}
        exc = {k: jax.device_put(v, bshard)
               for k, v in host_batch(200 + i).items()}
        params, opt_state, metrics = step(params, opt_state, batch, interp,
                                          exc, spec)
        metrics_seq.append({k: float(v) for k, v in metrics.items()})
    return metrics_seq, params


def test_dp8_matches_single_device(setup):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    m1, p1 = _run(setup, jax.devices()[:1])
    m8, p8 = _run(setup, jax.devices()[:8])
    for step_i, (a, b) in enumerate(zip(m1, m8)):
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=2e-4, abs=1e-6), \
                f"step {step_i} metric {k}: {a[k]} vs {b[k]}"
    flat1 = jax.tree.leaves(p1)
    flat8 = jax.tree.leaves(p8)
    for x, y in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)


def test_grad_allreduce_happens(setup):
    """With a batch whose two halves differ, each device's local gradient
    differs — identical final params across devices proves the psum ran."""
    model, tables, opt, params, host_batch, spec = setup
    mesh = make_mesh(jax.devices()[:2])
    bshard = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt.init(params), rep)
    step = make_train_step(model, tables, opt, StepFlags(),
                           exc_variant="ori", donate=False)
    batch = {k: jax.device_put(v, bshard) for k, v in host_batch(0).items()}
    interp = {k: jax.device_put(v, bshard)
              for k, v in host_batch(1).items()}
    exc = {k: jax.device_put(v, bshard) for k, v in host_batch(2).items()}
    params, _, _ = step(params, opt_state, batch, interp, exc, spec)
    w = params["conv"][0]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    np.testing.assert_array_equal(shards[0], shards[1])


def test_dp_shrink_warns(tmp_path, small_human):
    """Batch sizes not divisible by the device count silently trained on a
    mesh prefix in round 1 — now the Trainer warns about the idle chips
    (VERDICT r1 item 8) and still builds the largest valid mesh."""
    import warnings
    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer
    from tests.conftest import SMALL_MODEL_OVERRIDES

    cfg = Config.from_dict({
        "model": dict(SMALL_MODEL_OVERRIDES),
        "data": {"synthetic": True, "synthetic_train": 12,
                 "synthetic_test": 4, "synthetic_n_theta": 16,
                 "synthetic_n_phi": 36, "normalization": "zeroroot"},
        # the paper recipe: batch 4 on an 8-device mesh
        "train": {"n_epochs": 1, "batch_train": 4, "batch_interp": 4,
                  "batch_test": 4, "ck_frequency": 100,
                  "save_recons": False},
    })
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tr = Trainer(cfg, str(tmp_path))
    msgs = [str(w.message) for w in caught
            if "data-parallel mesh uses only" in str(w.message)]
    assert msgs, "expected an idle-chip warning for batch 4 on 8 devices"
    assert "4/8" in msgs[0]
    assert tr.mesh is not None and len(tr.mesh.devices.ravel()) == 4


def test_trainer_dryrun_scan_banded_dp8():
    """The driver's multichip artifact must certify the SHIPPED trainer
    (VERDICT r3 item 4): multi-epoch lax.scan chunks, the dynamic exc
    variant, and banded gather tables, all over the 8-device DP mesh —
    the same machinery configs/train_fast.yaml trains with.
    trainer_dryrun raises on any regression (mesh not used, bands not
    attached, scan not engaged, no 2-epoch fusion, non-finite loss)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import trainer_dryrun

    val = trainer_dryrun(8)
    assert np.isfinite(val)
