"""End-to-end train-step tests: full loss stack + optimizer, loss decreases."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantichuman_tpu.constants import KPS_KEEP
from semantichuman_tpu.models import build_model
from semantichuman_tpu.train import losses as L
from semantichuman_tpu.train.edits import EditSampler
from semantichuman_tpu.train.optim import make_optimizer
from semantichuman_tpu.train.step import (StepFlags, flags_for_epoch,
                                          make_eval_step, make_train_step)


@pytest.fixture(scope="module")
def setup(small_cfg, small_hierarchy, small_human):
    model = build_model(small_cfg, small_hierarchy, small_human.part_dict)
    params = model.init(0)
    tables = L.build_loss_tables(small_human.template_faces,
                                 small_human.J_regressor,
                                 small_human.part_dict)
    meshes = small_human.sample_meshes(8, seed=5).astype(np.float32)
    measure = small_human.measures(meshes).astype(np.float32)
    verts = np.concatenate([meshes, np.zeros((8, 1, 3), np.float32)], axis=1)
    batch = {"verts": jnp.asarray(verts[:4]),
             "measure": jnp.asarray(measure[:4])}
    interp = {"verts": jnp.asarray(verts[4:])}
    exc = {"verts": jnp.asarray(verts[4:])}
    return model, params, tables, batch, interp, exc


def test_full_train_step_decreases_loss(setup):
    model, params, tables, batch, interp, exc = setup
    flags = StepFlags()
    opt = make_optimizer(1e-3, 5e-5, 0.99, steps_per_epoch=10)
    step = make_train_step(model, tables, opt, flags, exc_variant="ori",
                           donate=False)
    opt_state = opt.init(params)
    sampler = EditSampler(edit_mode="equal", seed=2)
    spec = sampler.sample_interp(epoch=1, batch_size=4)
    spec = {k: jnp.asarray(v) for k, v in spec.items()}
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch, interp,
                                          exc, spec)
        losses.append(float(metrics["loss"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert losses[-1] < losses[0]
    # every branch actually contributed
    for key in ("rec", "edgereg", "zpartreg", "vol", "interp_kps",
                "interp_euc", "exc_kps", "exc_euc"):
        assert key in metrics
    # stability diagnostic: raw (pre-clip) gradient global-norm
    assert float(metrics["gnorm"]) > 0.0


def test_exc_variant_m_compiles(setup):
    model, params, tables, batch, interp, exc = setup
    flags = StepFlags()
    opt = make_optimizer(1e-3, 5e-5, 0.99, steps_per_epoch=10)
    step = make_train_step(model, tables, opt, flags, exc_variant="m",
                           donate=False)
    opt_state = opt.init(params)
    spec = EditSampler(edit_mode="rand", seed=3).sample_interp(1, 4)
    spec = {k: jnp.asarray(v) for k, v in spec.items()}
    _, _, metrics = step(params, opt_state, batch, interp, exc, spec)
    assert "vol" not in metrics          # volume loss only under 'ori'
    assert np.isfinite(float(metrics["loss"]))


def test_flags_for_epoch_gating(small_cfg):
    t = small_cfg.train
    f = flags_for_epoch(t, epoch=1)
    assert f.edgereg and f.zpartreg and f.interp and f.exc and f.vol
    t2 = t.__class__(**{**t.__dict__, "edgereg_epoch": 5})
    f2 = flags_for_epoch(t2, epoch=3)
    assert not f2.edgereg


def test_eval_step_metrics(setup):
    model, params, tables, batch, _, _ = setup
    ev = make_eval_step(model, tables)
    out = ev(params, batch)
    assert out["rec"].shape == batch["verts"].shape
    assert out["z"].shape == (4, 17, 8)
    assert out["l1"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(out["l1"])))
    # mm metric is 1000x the raw euclidean scale
    assert float(out["l2_mm"].mean()) > float(out["l1"].mean())


def test_edit_sampler_modes():
    s = EditSampler(edit_mode="rand", rand_mode="warm_up", noleaf_flag=True,
                    seed=0)
    spec = s.sample_interp(epoch=10, batch_size=4)   # warm_up epoch<20 -> 1
    assert spec["a_full"].shape == (4, 17)
    assert spec["n_edited"] <= 1
    s2 = EditSampler(edit_mode="equal", seed=0)
    spec2 = s2.sample_interp(epoch=1, batch_size=4)
    assert spec2["n_edited"] == 12      # all non-leaf parts
    edited_vals = spec2["a_full"][:, spec2["edited_mask"] > 0]
    assert np.allclose(edited_vals, edited_vals[0, 0])
    assert 0.8 <= edited_vals[0, 0] <= 1.2
    # exc edit mode uses flipped measure ratios
    m = np.abs(np.random.default_rng(0).normal(1, 0.1, (4, 32))).astype(
        np.float32)
    s3 = EditSampler(edit_mode="exc", seed=0)
    spec3 = s3.sample_interp(1, 4, measure=m)
    assert spec3["a_full"].shape == (4, 17)
    # variant coin flip is deterministic under seed
    s4 = EditSampler(exc_mode="ori_or_m", seed=1)
    seq = [s4.sample_exc_variant() for _ in range(8)]
    s5 = EditSampler(exc_mode="ori_or_m", seed=1)
    assert seq == [s5.sample_exc_variant() for _ in range(8)]


def test_edit_mode_exc_sampler():
    """edit_mode='exc': per-sample girth targets from the flipped batch's
    measures (reference train_funcs.py:186-199)."""
    from semantichuman_tpu.train.edits import EditSampler
    from semantichuman_tpu.constants import NOLEAF_PART_INDICES
    rng = np.random.default_rng(0)
    measure = rng.uniform(0.5, 2.0, (4, 32)).astype(np.float32)
    s = EditSampler(edit_mode="exc", seed=0)
    spec = s.sample_interp(epoch=5, batch_size=4, measure=measure)
    a = spec["a_full"]
    assert a.shape == (4, 17)
    flipped = np.flip(measure, axis=0) / measure
    for k, p in enumerate(NOLEAF_PART_INDICES):
        np.testing.assert_allclose(a[:, p], flipped[:, k], rtol=1e-6)
    # leaf parts untouched
    leaf = [i for i in range(17) if i not in NOLEAF_PART_INDICES]
    np.testing.assert_allclose(a[:, leaf], 1.0)
    with pytest.raises(ValueError, match="needs the batch measures"):
        s.sample_interp(epoch=5, batch_size=4)


def test_editskl_branch(setup):
    """interp branch with skeleton-length editing enabled
    (editskl_flag, reference train_funcs.py:163-168)."""
    model, params, tables, batch, interp, exc = setup
    opt = make_optimizer(1e-3, 5e-5, 0.99, steps_per_epoch=10)
    step = make_train_step(model, tables, opt, StepFlags(editskl=True),
                           exc_variant="ori", donate=False)
    sampler = EditSampler(edit_mode="rand", editskl_flag=True, seed=1)
    spec = sampler.sample_interp(epoch=200, batch_size=4)
    assert (spec["skl_len_factor"] != 1.0).any()
    spec = {k: jnp.asarray(v) for k, v in spec.items()}
    _p, _o, metrics = step(params, opt.init(params), batch, interp, exc,
                           spec)
    assert np.isfinite(float(metrics["loss"]))
    assert "interp_kps" in metrics


def test_lr_schedules():
    """exp reproduces the reference StepLR (lr·γ^epoch); cosine anneals
    lr→0 over n_epochs; warmup ramps linearly and composes with both."""
    import numpy as np

    from semantichuman_tpu.train.optim import make_schedule

    exp = make_schedule(1e-3, 0.9, steps_per_epoch=2)
    np.testing.assert_allclose(float(exp(0)), 1e-3)
    np.testing.assert_allclose(float(exp(1)), 1e-3)       # same epoch
    np.testing.assert_allclose(float(exp(2)), 0.9e-3)     # epoch 1
    np.testing.assert_allclose(float(exp(20)), 1e-3 * 0.9 ** 10, rtol=1e-6)

    cos = make_schedule(4e-3, 0.0, steps_per_epoch=2, schedule_kind="cosine",
                        n_epochs=100)
    np.testing.assert_allclose(float(cos(0)), 4e-3)
    np.testing.assert_allclose(float(cos(100)), 2e-3, rtol=1e-6)  # epoch 50
    assert float(cos(200)) < 1e-9                                  # epoch 100

    warm = make_schedule(4e-3, 1.0, steps_per_epoch=2, warmup_epochs=10)
    np.testing.assert_allclose(float(warm(0)), 4e-3 * (1 / 20), rtol=1e-6)
    np.testing.assert_allclose(float(warm(9)), 4e-3 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(warm(19)), 4e-3, rtol=1e-6)
    np.testing.assert_allclose(float(warm(40)), 4e-3, rtol=1e-6)

    import pytest
    with pytest.raises(ValueError, match="n_epochs"):
        make_schedule(1e-3, 0.9, 2, schedule_kind="cosine")
    with pytest.raises(ValueError, match="schedule_kind"):
        make_schedule(1e-3, 0.9, 2, schedule_kind="linear")


def test_grad_clip_bounds_update_and_imports():
    """grad_clip > 0 prepends global-norm clipping: a huge gradient must
    produce the same update as that gradient rescaled to the clip norm,
    clip=0 must leave the chain reference-exact, and the torch
    optimizer-state importer's type-walk must pass the clip's EmptyState
    through untouched."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from semantichuman_tpu.utils.import_torch import _build_optax_state

    params = {"w": jnp.zeros((4,), jnp.float32)}
    big = {"w": jnp.full((4,), 100.0, jnp.float32)}       # ||g|| = 200

    opt = make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10,
                         grad_clip=1.0)
    state = opt.init(params)
    upd_big, _ = opt.update(big, state, params)

    scaled = {"w": big["w"] / jnp.linalg.norm(big["w"])}  # norm 1.0
    upd_ref, _ = opt.update(scaled, opt.init(params), params)
    np.testing.assert_allclose(np.asarray(upd_big["w"]),
                               np.asarray(upd_ref["w"]), rtol=1e-6)

    # clip=0: chain is the unclipped reference chain (same update)
    opt0 = make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10)
    u0, _ = opt0.update(big, opt0.init(params), params)
    ug, _ = make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10,
                           grad_clip=0.0).update(
        big, opt0.init(params), params)
    np.testing.assert_array_equal(np.asarray(u0["w"]), np.asarray(ug["w"]))

    # importer: moments land in ScaleByAdamState with the clip present
    mu = {"w": np.ones((4,), np.float32)}
    nu = {"w": np.full((4,), 2.0, np.float32)}
    st = _build_optax_state(opt, params, mu, nu, adam_count=7,
                            schedule_count=70)
    adam = [s for s in st if isinstance(s, optax.ScaleByAdamState)]
    assert len(adam) == 1 and int(adam[0].count) == 7
    np.testing.assert_array_equal(np.asarray(adam[0].mu["w"]), mu["w"])


def test_adam_b2_changes_second_moment():
    """adam_b2 plumbs into scale_by_adam: the second-moment estimate (and
    hence the second update) must differ from the 0.999 default, while the
    default keeps reference parity with an explicit 0.999."""
    import jax.numpy as jnp
    import numpy as np

    params = {"w": jnp.zeros((4,), jnp.float32)}
    g1 = {"w": jnp.full((4,), 1.0, jnp.float32)}
    g2 = {"w": jnp.full((4,), 0.1, jnp.float32)}

    def two_steps(opt):
        st = opt.init(params)
        _, st = opt.update(g1, st, params)
        u, _ = opt.update(g2, st, params)
        return np.asarray(u["w"])

    u_default = two_steps(make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10))
    u_999 = two_steps(make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10,
                                     adam_b2=0.999))
    u_95 = two_steps(make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10,
                                    adam_b2=0.95))
    np.testing.assert_array_equal(u_default, u_999)
    assert not np.allclose(u_default, u_95)


def test_skip_nonfinite_guards_updates_and_imports():
    """skip_nonfinite > 0 wraps the chain in apply_if_finite: NaN grads
    produce a zero update with Adam moments untouched, finite grads match
    the unwrapped chain, and the torch optimizer-state importer recurses
    through the wrapper to land the moments."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from semantichuman_tpu.utils.import_torch import _build_optax_state

    params = {"w": jnp.zeros((4,), jnp.float32)}
    good = {"w": jnp.full((4,), 1.0, jnp.float32)}
    bad = {"w": jnp.array([1.0, jnp.nan, 1.0, 1.0], jnp.float32)}

    opt = make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10,
                         skip_nonfinite=3)
    st = opt.init(params)
    u_bad, st_after = opt.update(bad, st, params)
    np.testing.assert_array_equal(np.asarray(u_bad["w"]), np.zeros(4))
    assert int(st_after.notfinite_count) == 1
    adam0 = [s for s in st_after.inner_state
             if isinstance(s, optax.ScaleByAdamState)][0]
    np.testing.assert_array_equal(np.asarray(adam0.mu["w"]), np.zeros(4))

    # finite grads: identical update to the unwrapped chain
    u_g, _ = opt.update(good, opt.init(params), params)
    ref = make_optimizer(1e-3, 0.0, 0.99, steps_per_epoch=10)
    u_r, _ = ref.update(good, ref.init(params), params)
    np.testing.assert_array_equal(np.asarray(u_g["w"]), np.asarray(u_r["w"]))

    # importer lands moments through the wrapper
    mu = {"w": np.ones((4,), np.float32)}
    nu = {"w": np.full((4,), 2.0, np.float32)}
    st_imp = _build_optax_state(opt, params, mu, nu, adam_count=5,
                                schedule_count=50)
    assert isinstance(st_imp, optax.ApplyIfFiniteState)
    adam = [s for s in st_imp.inner_state
            if isinstance(s, optax.ScaleByAdamState)]
    assert len(adam) == 1 and int(adam[0].count) == 5
    np.testing.assert_array_equal(np.asarray(adam[0].mu["w"]), mu["w"])
    # and the imported state drives an update
    u_i, _ = opt.update(good, st_imp, params)
    assert np.all(np.isfinite(np.asarray(u_i["w"])))
