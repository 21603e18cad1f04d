"""Block-banded spiral gather (ops/banding.py + spiral_conv_banded).

The banded form must be EXACTLY the gather in the forward (every output
row sums one product of a 1.0, out-of-band entries are fixed up by an
exact sparse add, dummy pads contribute an exact zero), and equal in the
backward up to f32 summation order — except at the structurally-zero
dummy row, whose cotangent every producing op discards (the conv's
output-dummy re-zeroing; unpool/pool dummy rows map only to dummy rows,
tests/test_topology.py pins that table invariant).
"""

from __future__ import annotations

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantichuman_tpu.ops.banding import (BAND_PRESETS, build_band_spec,
                                           pick_band_spec)

SC = importlib.import_module("semantichuman_tpu.ops.spiral_conv")


def _local_table(rng, v1, s, spread=40, dummy_frac=0.2, far_frac=0.05):
    """Spiral-like table: mostly near-diagonal, some dummy pads, some far
    outliers — the shape banding must handle."""
    base = np.arange(v1)[:, None]
    sp = np.clip(base + rng.integers(-spread, spread, (v1, s)), 0, v1 - 1)
    sp[rng.random((v1, s)) < dummy_frac] = v1 - 1
    far = rng.random((v1, s)) < far_frac
    sp[far] = rng.integers(0, v1, far.sum())
    sp[-1] = v1 - 1  # dummy row spirals to itself
    return sp.astype(np.int32)


def test_band_spec_covers_every_entry():
    """Every non-dummy table entry is either in-band (rel in [0, W)) or in
    the fixup lists; fixup padding is (pos=0, src=dummy) no-ops."""
    rng = np.random.default_rng(3)
    v1, s = 517, 9
    sp = _local_table(rng, v1, s)
    spec = build_band_spec(sp, R=64, W=128)
    starts = np.asarray(spec.starts)
    rel = sp + spec.W - starts[np.arange(v1) // spec.R][:, None]
    hit = (rel >= 0) & (rel < spec.W)
    miss = ~hit & (sp != v1 - 1)
    n_real = int(miss.sum())
    assert spec.oob_frac == pytest.approx(n_real / sp.size)
    got = set(zip(spec.fix_pos[:n_real].tolist(),
                  spec.fix_src[:n_real].tolist()))
    vv, ss = np.nonzero(miss)
    want = set(zip((vv * s + ss).tolist(), sp[vv, ss].tolist()))
    assert got == want
    assert len(spec.fix_pos) % 8 == 0
    assert all(p == 0 for p in spec.fix_pos[n_real:])
    assert all(srec == v1 - 1 for srec in spec.fix_src[n_real:])


def test_pick_band_spec_rejects_nonlocal_tables():
    """A table with no locality exceeds every preset's out-of-band budget
    -> None (the level keeps the gather path)."""
    rng = np.random.default_rng(4)
    v1, s = 4096, 9
    sp = rng.integers(0, v1, (v1, s)).astype(np.int32)
    assert pick_band_spec(sp) is None
    # and a local one adopts the first (smallest-W) preset
    local = _local_table(rng, v1, s, spread=60, far_frac=0.0)
    spec = pick_band_spec(local)
    assert spec is not None and (spec.R, spec.W) == BAND_PRESETS[0]


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_banded_conv_forward_exact(dtype):
    """spiral_conv_banded forward == the take path BITWISE, f32 and bf16,
    dummy pads and out-of-band fixups included."""
    rng = np.random.default_rng(11)
    v1, s, c, co = 333, 7, 6, 9
    sp = _local_table(rng, v1, s)
    spec = build_band_spec(sp, R=64, W=128)
    assert 0 < spec.oob_frac < 0.15
    x = rng.standard_normal((5, v1, c)).astype(np.float32)
    x[:, -1] = 0.0
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    ref = SC.spiral_conv_take(jnp.asarray(x), jnp.asarray(sp),
                              jnp.asarray(w), jnp.asarray(bias), "elu",
                              compute_dtype=dtype)
    got = SC.spiral_conv_banded(jnp.asarray(x), jnp.asarray(sp), spec,
                                jnp.asarray(w), jnp.asarray(bias), "elu",
                                compute_dtype=dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_banded_conv_grads_match():
    """Weight/bias grads equal the take path to fp noise; x-grads match off
    the dummy row (the banded form routes dummy-pad cotangents differently,
    but only INTO the structurally-zero dummy row)."""
    rng = np.random.default_rng(12)
    v1, s, c, co = 333, 7, 6, 9
    sp = _local_table(rng, v1, s)
    spec = build_band_spec(sp, R=64, W=128)
    x = rng.standard_normal((3, v1, c)).astype(np.float32)
    x[:, -1] = 0.0
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)

    def loss(fn_args):
        fn, xx, ww, bb = fn_args
        return jnp.sum(fn(xx, ww, bb) ** 2)

    def take(xx, ww, bb):
        return SC.spiral_conv_take(xx, jnp.asarray(sp), ww, bb, "elu")

    def banded(xx, ww, bb):
        return SC.spiral_conv_banded(xx, jnp.asarray(sp), spec, ww, bb,
                                     "elu")

    args = (jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))
    g_t = jax.grad(lambda *a: jnp.sum(take(*a) ** 2), argnums=(0, 1, 2))(
        *args)
    g_b = jax.grad(lambda *a: jnp.sum(banded(*a) ** 2), argnums=(0, 1, 2))(
        *args)
    np.testing.assert_allclose(np.asarray(g_b[1]), np.asarray(g_t[1]),
                               rtol=1e-5, atol=1e-5)  # dw
    np.testing.assert_allclose(np.asarray(g_b[2]), np.asarray(g_t[2]),
                               rtol=1e-5, atol=1e-5)  # db
    dx_t, dx_b = np.asarray(g_t[0]), np.asarray(g_b[0])
    np.testing.assert_allclose(dx_b[:, :-1], dx_t[:, :-1],
                               rtol=1e-4, atol=1e-4)


def test_banded_dispatch_gated_off_on_cpu(monkeypatch):
    """On the CPU backend spiral_conv must ignore `band`; with the gate
    forced on it must route to the banded form (checked by equality with
    the explicit banded call on a table whose one-hot gate also fires —
    banded takes precedence)."""
    rng = np.random.default_rng(13)
    v1, s, c, co = 300, 7, 4, 8
    sp = _local_table(rng, v1, s)
    spec = build_band_spec(sp, R=64, W=128)
    x = rng.standard_normal((4, v1, c)).astype(np.float32)
    x[:, -1] = 0.0
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(sp), jnp.asarray(w),
            jnp.asarray(bias))

    assert not SC._banded_ok(4)
    out_cpu = SC.spiral_conv(*args, "elu", band=spec)
    ref = SC.spiral_conv_take(*args, "elu")
    np.testing.assert_array_equal(np.asarray(out_cpu), np.asarray(ref))

    monkeypatch.setattr(SC, "_banded_ok", lambda *a: True)
    out_banded = SC.spiral_conv(*args, "elu", band=spec)
    np.testing.assert_array_equal(np.asarray(out_banded), np.asarray(ref))


def test_banded_pool_exact():
    """pool_banded is a pure row selection -> bitwise equality with take
    on CPU, including out-of-band fixups and the dummy target row."""
    from semantichuman_tpu.ops import sampling as S

    rng = np.random.default_rng(21)
    vf1, vc1, b, c = 1100, 551, 3, 16
    # near-diagonal with 2x stretch (QEM survivor order) + a few jumps
    pidx = np.clip(np.arange(vc1) * 2
                   + rng.integers(-30, 30, vc1), 0, vf1 - 1)
    pidx[rng.random(vc1) < 0.03] = rng.integers(0, vf1)
    pidx[-1] = vf1 - 1
    pidx = pidx.astype(np.int32)
    spec = build_band_spec(pidx[:, None], R=64, W=192, dummy=vf1 - 1)
    assert spec.oob_frac > 0
    x = rng.standard_normal((b, vf1, c)).astype(np.float32)
    x[:, -1] = 0.0
    got = S.pool_banded(jnp.asarray(x), jnp.asarray(pidx), spec)
    ref = S.pool_take(jnp.asarray(x), jnp.asarray(pidx))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # grads match off the dummy source row
    g_b = jax.grad(lambda xx: jnp.sum(
        S.pool_banded(xx, jnp.asarray(pidx), spec) ** 2))(jnp.asarray(x))
    g_t = jax.grad(lambda xx: jnp.sum(
        S.pool_take(xx, jnp.asarray(pidx)) ** 2))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_b)[:, :-1],
                               np.asarray(g_t)[:, :-1],
                               rtol=1e-6, atol=1e-6)


def test_banded_unpool_matches():
    """unpool_banded matches the barycentric 3-gather within f32
    reassociation noise (same bar as the adopted one-hot dense form),
    fixups and dummy row included."""
    from semantichuman_tpu.ops import sampling as S

    rng = np.random.default_rng(22)
    vf1, vc1, b, c = 1101, 552, 3, 8
    idx = np.clip((np.arange(vf1)[:, None] // 2)
                  + rng.integers(-25, 25, (vf1, 3)), 0, vc1 - 1)
    far = rng.random((vf1, 3)) < 0.04
    idx[far] = rng.integers(0, vc1, far.sum())
    idx[-1] = vc1 - 1
    idx = idx.astype(np.int32)
    w = rng.dirichlet(np.ones(3), vf1).astype(np.float32)
    w[-1] = [1.0, 0.0, 0.0]
    spec = build_band_spec(idx, R=64, W=128, dummy=vc1 - 1)
    assert spec.oob_frac > 0
    x = rng.standard_normal((b, vc1, c)).astype(np.float32)
    x[:, -1] = 0.0
    got = S.unpool_banded(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                          spec)
    ref = S.unpool_take(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    g_b = jax.grad(lambda xx: jnp.sum(S.unpool_banded(
        xx, jnp.asarray(idx), jnp.asarray(w), spec) ** 2))(jnp.asarray(x))
    g_t = jax.grad(lambda xx: jnp.sum(S.unpool_take(
        xx, jnp.asarray(idx), jnp.asarray(w)) ** 2))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_b)[:, :-1],
                               np.asarray(g_t)[:, :-1],
                               rtol=1e-5, atol=1e-5)


def test_sampling_banded_dispatch_order(monkeypatch):
    """In the sampling dispatchers the MEASURED small-batch one-hot
    adoption outranks banding; banding engages at large batch."""
    from semantichuman_tpu.ops import sampling as S

    calls = []
    monkeypatch.setattr(S, "_onehot_ok",
                        lambda b, v: calls.append("oh_gate") or b <= 16)
    monkeypatch.setattr(S, "_pool_band_ok", lambda *a: True)
    monkeypatch.setattr(S, "_unpool_band_ok", lambda *a: True)
    monkeypatch.setattr(S, "pool_dense",
                        lambda x, i: calls.append("dense") or S.pool_take(x, i))
    monkeypatch.setattr(S, "pool_banded",
                        lambda x, i, band: calls.append("banded")
                        or S.pool_take(x, i))
    rng = np.random.default_rng(23)
    vf1, vc1 = 600, 301
    pidx = jnp.asarray(np.clip(np.arange(vc1) * 2, 0, vf1 - 1), jnp.int32)
    spec = object()
    S.pool(jnp.asarray(rng.standard_normal((4, vf1, 3)), jnp.float32),
           pidx, band=spec)
    assert calls[-1] == "dense"
    S.pool(jnp.asarray(rng.standard_normal((32, vf1, 3)), jnp.float32),
           pidx, band=spec)
    assert calls[-1] == "banded"


def _force_band_gates(monkeypatch):
    # single source of truth for the patch set: utils/testing.py (shared
    # with __graft_entry__.trainer_dryrun, so the dryrun certifies the
    # same gate-forced path these tests exercise)
    from semantichuman_tpu.utils.testing import band_gate_patches
    for mod, name, val in band_gate_patches():
        monkeypatch.setattr(mod, name, val)


def test_banded_trainer_fits(tmp_path, monkeypatch, small_human):
    """cfg.model.banded_conv=True trains end-to-end through the jitted
    multi-branch step (gates forced on the CPU backend): the banded trunk's
    backward, the band closures inside jit, and eval all hold together."""
    _force_band_gates(monkeypatch)
    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer
    from tests.conftest import SMALL_MODEL_OVERRIDES

    cfg = Config.from_dict({
        "model": dict(SMALL_MODEL_OVERRIDES, banded_conv=True),
        "data": {"synthetic": True, "synthetic_train": 8,
                 "synthetic_test": 4, "normalization": "zeroroot"},
        "train": {"n_epochs": 1, "batch_train": 4, "batch_interp": 4,
                  "batch_test": 4, "ck_frequency": 100, "log_every": 0},
    })
    tr = Trainer(cfg, str(tmp_path))
    assert any(b is not None for b in tr.model.tables.bands)
    tr.fit()
    assert np.isfinite(tr.validate())


def test_spiral_conv_auto_accepts_band(monkeypatch):
    """The factory's default TPU conv_fn (spiral_conv_auto, use_pallas=True)
    must pass `band` through to the XLA dispatcher — the trunks hand it to
    whatever conv_fn was selected, and banding only ever engages on the
    backends that select spiral_conv_auto."""
    from semantichuman_tpu.ops.pallas.spiral_conv_pallas import \
        spiral_conv_auto

    rng = np.random.default_rng(31)
    v1, s, c, co = 300, 7, 4, 8
    sp = _local_table(rng, v1, s)
    spec = build_band_spec(sp, R=64, W=128)
    x = rng.standard_normal((4, v1, c)).astype(np.float32)
    x[:, -1] = 0.0
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(sp), jnp.asarray(w),
            jnp.asarray(bias))
    ref = SC.spiral_conv_take(*args, "elu")
    monkeypatch.setattr(SC, "_banded_ok", lambda *a: True)
    got = spiral_conv_auto(*args, "elu", band=spec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_banded_symbolic_batch_export(small_cfg, small_hierarchy,
                                      small_human, monkeypatch, tmp_path):
    """The banded forms are shape-polymorphic in batch: a banded model must
    export a SYMBOLIC-batch serving artifact and serve multiple batch sizes
    from it (banding will run under TPU serving, where the gate is on)."""
    import dataclasses

    from semantichuman_tpu.models import build_model
    from semantichuman_tpu.serving import ServingBundle, export_inference

    _force_band_gates(monkeypatch)
    cfg = dataclasses.replace(
        small_cfg, model=dataclasses.replace(small_cfg.model,
                                             banded_conv=True))
    model = build_model(cfg, small_hierarchy, small_human.part_dict)
    assert any(b is not None for b in model.tables.bands)
    params = model.init(0)
    out = str(tmp_path / "bundle")
    manifest = export_inference(model, params, small_human.J_regressor, out,
                                batch_size=2)
    assert manifest["symbolic_batch"] is True
    served = ServingBundle(out)
    for b in (1, 3):
        m = small_human.sample_meshes(b, seed=b).astype(np.float32)
        v = np.concatenate([m, np.zeros((b, 1, 3), np.float32)], axis=1)
        rec, _z, _zk = served.forward(jnp.asarray(v))
        assert rec.shape[0] == b and np.all(np.isfinite(np.asarray(rec)))


def test_banded_model_forward_matches(small_hierarchy, small_human,
                                      monkeypatch):
    """A PartAE built with banded tables (gate forced on, presets scaled to
    the small topology) reproduces the plain model's forward within f32
    reassociation noise (banded convs/pools are selection-exact; banded
    unpool reorders its 3-term weighted sums, same bar as the adopted
    one-hot dense unpool)."""
    from semantichuman_tpu.constants import KPS_INDEX_LIST
    from semantichuman_tpu.models import tables as tables_mod
    from semantichuman_tpu.models.part_ae import PartAE

    hier = small_hierarchy
    coarse = hier.downsample_part_indices(small_human.part_dict)
    plain = tables_mod.device_tables(hier)
    monkeypatch.setattr(tables_mod, "BAND_MIN_V1", 1)
    monkeypatch.setattr(tables_mod, "BAND_MIN_ROWS", 1)
    for name in ("BAND_PRESETS", "UNPOOL_BAND_PRESETS",
                 "POOL_BAND_PRESETS"):
        monkeypatch.setattr(f"semantichuman_tpu.ops.banding.{name}",
                            ((8, 32), (16, 64)))
    monkeypatch.setattr("semantichuman_tpu.ops.banding.MAX_OOB_FRAC", 1.0)
    banded = tables_mod.device_tables(hier, banded=True)
    assert any(b is not None for b in banded.bands)
    assert any(b is not None for b in banded.pool_bands)
    assert any(b is not None for b in banded.unpool_bands)
    monkeypatch.setattr(SC, "_banded_ok", lambda *a: True)
    from semantichuman_tpu.ops import sampling as sampling_mod
    monkeypatch.setattr(sampling_mod, "_pool_band_ok", lambda *a: True)
    monkeypatch.setattr(sampling_mod, "_unpool_band_ok", lambda *a: True)

    kw = dict(filters_enc=[[3, 8, 8, 16, 16], [[]] * 5],
              filters_dec=[[16, 16, 8, 8, 8], [[], [], [], [], 3]])
    m0 = PartAE(plain, coarse, KPS_INDEX_LIST, **kw)
    m1 = PartAE(banded, coarse, KPS_INDEX_LIST, **kw)
    params = m0.init(0)
    meshes = small_human.sample_meshes(2, seed=3)
    x = np.concatenate([meshes, np.zeros((2, 1, 3), np.float32)], axis=1)
    xj = jnp.asarray(x)
    kps = jnp.einsum("jv,bvd->bjd", jnp.asarray(small_human.J_regressor),
                     xj[:, :-1])
    from semantichuman_tpu.constants import KPS_KEEP
    kpsk = kps[:, jnp.asarray(KPS_KEEP)]
    y0 = m0(params, xj, kpsk)[0]
    y1 = m1(params, xj, kpsk)[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    # conv-banding alone (no sampling bands) stays BITWISE
    conv_only = tables_mod.DeviceTables(
        spirals=banded.spirals, pool_idx=banded.pool_idx,
        unpool_idx=banded.unpool_idx, unpool_w=banded.unpool_w,
        sizes=banded.sizes, spiral_sizes=banded.spiral_sizes,
        bands=banded.bands)
    m2 = PartAE(conv_only, coarse, KPS_INDEX_LIST, **kw)
    y2 = m2(params, xj, kpsk)[0]
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y2))
