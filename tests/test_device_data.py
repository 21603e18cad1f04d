"""Device-resident dataset: on-device gather+normalize must equal the host
pipeline exactly (same schedule, same normalization semantics)."""

import numpy as np
import pytest

from semantichuman_tpu.data.dataset import (ArraySource, BatchLoader,
                                            ShapeStats, compute_stats,
                                            place_batch)
from semantichuman_tpu.data.device_data import (DeviceBatchLoader,
                                                DeviceDataSource)


@pytest.fixture(scope="module")
def human_data(small_human):
    train = small_human.sample_meshes(20, seed=3).astype(np.float32)
    meas = small_human.measures(train).astype(np.float32)
    return train, meas, small_human.J_regressor.astype(np.float32)


@pytest.mark.parametrize("norm", ["No", "zeroroot", "zeromean_onelength",
                                  "zeroroot_gass", "normal", "small"])
def test_device_batches_match_host(human_data, norm):
    train, meas, jr = human_data
    # 'normal' stats are indexed by sample id (the reference's test-split
    # quirk), so the stats split must cover every loaded index
    stats = compute_stats(train, train, norm)
    src = ArraySource(train, meas)
    mk = lambda: BatchLoader(src, 6, shuffle=True, seed=5,  # noqa: E731
                             drop_last=False, pad_final=True,
                             normalization=norm, j_regressor=jr, stats=stats)
    dsrc = DeviceDataSource(train, meas, norm, j_regressor=jr, stats=stats)

    # gass divides a cancellation-prone numerator (v - mean) by per-vertex
    # stds: host numpy and XLA round the divide differently, so the
    # comparison needs an absolute tolerance at normalized scale
    atol = 1e-3 if "gass" in norm else 1e-5
    host = [place_batch(b) for b in mk()]
    dev = list(DeviceBatchLoader(mk(), dsrc))
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        np.testing.assert_allclose(np.asarray(d["verts"]),
                                   np.asarray(h["verts"]),
                                   rtol=1e-5, atol=atol)
        np.testing.assert_allclose(np.asarray(d["measure"]),
                                   np.asarray(h["measure"]), rtol=1e-6)
        np.testing.assert_array_equal(d["global_idx"], h["global_idx"])
        assert d["pad"] == h["pad"]
        np.testing.assert_array_equal(np.asarray(d["valid"]),
                                      np.asarray(h["valid"]))


def test_device_loader_schedule_advances(human_data):
    """cycle() reshuffles per epoch exactly like the host loader."""
    train, meas, jr = human_data
    src = ArraySource(train)
    mk = lambda: BatchLoader(src, 5, shuffle=True, seed=1,  # noqa: E731
                             drop_last=True, normalization="zeroroot",
                             j_regressor=jr)
    dsrc = DeviceDataSource(train, None, "zeroroot", j_regressor=jr)
    host_it = mk().cycle()
    dev_it = DeviceBatchLoader(mk(), dsrc).cycle()
    for _ in range(9):  # crosses two epoch boundaries (4 batches/epoch)
        h, d = next(host_it), next(dev_it)
        np.testing.assert_array_equal(d["global_idx"], h["global_idx"])


def test_trainer_device_resident_matches_host(tmp_path, small_human):
    """Full Trainer: device-resident and host pipelines train to matching
    losses (same schedule, same math within float tolerance)."""
    import dataclasses

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer
    from tests.conftest import SMALL_MODEL_OVERRIDES

    def run(tag, resident):
        cfg = Config.from_dict({
            "model": dict(SMALL_MODEL_OVERRIDES),
            "data": {"synthetic": True, "synthetic_train": 16,
                     "synthetic_test": 8, "synthetic_n_theta": 16,
                     "synthetic_n_phi": 36, "normalization": "zeroroot",
                     "device_resident": resident},
            "train": {"n_epochs": 1, "batch_train": 8, "batch_interp": 8,
                      "batch_test": 8, "ck_frequency": 100,
                      "save_recons": False}})
        t = Trainer(cfg, str(tmp_path / tag))
        assert (t.device_data is not None) == bool(resident is True)
        t.fit()
        return t.validate()

    v_host = run("host", False)
    v_dev = run("dev", True)
    assert v_dev == pytest.approx(v_host, rel=2e-5)


def test_trainer_auto_respects_budget(tmp_path, small_human):
    """'auto' stays on the host path when the byte budget is exceeded, and
    device_resident=True errors instead of silently falling back."""
    import dataclasses

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer

    from tests.conftest import SMALL_MODEL_OVERRIDES

    base = {
        "model": dict(SMALL_MODEL_OVERRIDES),
        "data": {"synthetic": True, "synthetic_train": 16,
                 "synthetic_test": 8, "synthetic_n_theta": 16,
                 "synthetic_n_phi": 36, "normalization": "zeroroot",
                 "device_resident_max_gb": 1e-6},
        "train": {"n_epochs": 1, "batch_train": 8, "batch_interp": 8,
                  "batch_test": 8, "save_recons": False}}
    cfg = Config.from_dict(base)
    t = Trainer(cfg, str(tmp_path / "auto"))
    assert t.device_data is None

    cfg = Config.from_dict({**base, "data": {**base["data"],
                                             "device_resident": True}})
    with pytest.raises(ValueError, match="cannot be staged"):
        Trainer(cfg, str(tmp_path / "forced"))
