"""Model forward/backward tests on the small synthetic human."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantichuman_tpu.config import Config
from semantichuman_tpu.constants import KPS_KEEP
from semantichuman_tpu.models import build_model
from semantichuman_tpu.models.tables import device_tables


@pytest.fixture(scope="module")
def cfg(small_cfg):
    return small_cfg


@pytest.fixture(scope="module")
def part_model(cfg, small_hierarchy, small_human):
    model = build_model(cfg, small_hierarchy, small_human.part_dict)
    params = model.init(0)
    return model, params


@pytest.fixture(scope="module")
def batch(small_human, small_hierarchy):
    meshes = small_human.sample_meshes(4, seed=3)
    v = np.concatenate([meshes, np.zeros((4, 1, 3))], axis=1)  # dummy vertex
    kps = np.einsum("jv,bvd->bjd", small_human.J_regressor, meshes)
    return (jnp.asarray(v, jnp.float32),
            jnp.asarray(kps[:, KPS_KEEP], jnp.float32))


def test_part_ae_forward_shapes(part_model, batch, small_hierarchy):
    model, params = part_model
    x, kps = batch
    rec, z, z_kps = model(params, x, kps)
    V = small_hierarchy.sizes[0]
    assert rec.shape == (4, V + 1, 3)
    assert z.shape == (4, 17, 8)
    assert z_kps.shape == (4, 17, 8)
    assert np.all(np.isfinite(np.asarray(rec)))
    # dummy row must be exactly zero
    np.testing.assert_array_equal(np.asarray(rec[:, -1, :]), 0.0)


def test_part_ae_jit_consistent(part_model, batch):
    model, params = part_model
    x, kps = batch
    eager = model(params, x, kps)[0]
    jitted = jax.jit(lambda p, a, b: model(p, a, b)[0])(params, x, kps)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               atol=1e-5)


def test_part_ae_decode_roundtrip_shapes(part_model, batch):
    model, params = part_model
    x, kps = batch
    z, z_kps, dummy = model.encode(params, x, kps)
    rec = model.decode(params, z, z_kps, dummy)
    assert rec.shape == x.shape


def test_part_heads_use_all_coarse_vertices(part_model):
    """Every coarse vertex must be claimed by exactly one part head."""
    model, _ = part_model
    idx = np.asarray(model.part_pad_idx)
    mask = np.asarray(model.part_pad_mask)
    valid = idx[mask > 0]
    assert len(np.unique(valid)) == model.coarse_v
    assert len(valid) == model.coarse_v


def test_part_ae_grads_finite(part_model, batch):
    model, params = part_model
    x, kps = batch

    def loss_fn(p):
        rec, z, z_kps = model(p, x, kps)
        return jnp.mean(jnp.abs(rec - x)) + 1e-3 * jnp.mean(z ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.all(np.isfinite(np.asarray(g)))
    # conv weights actually receive gradient
    assert float(jnp.abs(grads["conv"][0]["w"]).sum()) > 0


def test_spiral_ae_baseline(cfg, small_hierarchy, batch):
    from tests.conftest import SMALL_MODEL_OVERRIDES
    cfg2 = Config.from_dict({"model": dict(SMALL_MODEL_OVERRIDES,
                                           model_type="neural3DMM", nz=64)})
    model = build_model(cfg2, small_hierarchy)
    params = model.init(1)
    x, _ = batch
    rec, z = model(params, x)
    assert rec.shape == x.shape
    assert z.shape == (4, 64)
    np.testing.assert_array_equal(np.asarray(rec[:, -1, :]), 0.0)


def test_vae_variant(cfg, small_hierarchy, batch):
    from tests.conftest import SMALL_MODEL_OVERRIDES
    cfg2 = Config.from_dict({"model": dict(SMALL_MODEL_OVERRIDES,
                                           model_type="neural3DMM", nz=32,
                                           vae=True)})
    model = build_model(cfg2, small_hierarchy)
    params = model.init(1)
    x, _ = batch
    z_sampled = model.encode(params, x, rng=jax.random.PRNGKey(2))
    z_mean = model.encode(params, x, rng=None)
    assert z_sampled.shape == (4, 32)
    assert not np.allclose(np.asarray(z_sampled), np.asarray(z_mean))


def test_padded_heads_match_ragged_math(part_model, batch):
    """The batched padded einsum must equal per-part ragged matmuls."""
    model, params = part_model
    x, kps = batch
    z, _, _ = model.encode(params, x, kps)
    # recompute ragged
    from semantichuman_tpu.models.common import encoder_trunk
    h = encoder_trunk(params["conv"], model.enc_plan, model.tables, x)
    h = np.asarray(h)
    w = np.asarray(params["enc_heads"]["w"])
    b = np.asarray(params["enc_heads"]["b"])
    idx = np.asarray(model.part_pad_idx)
    mask = np.asarray(model.part_pad_mask)
    c = model.enc_out_c
    for p in range(model.n_parts):
        n_p = int(mask[p].sum())
        rows = idx[p, :n_p]
        feats = h[:, rows, :].reshape(4, n_p * c)
        z_ref = feats @ w[p, :n_p * c] + b[p]
        np.testing.assert_allclose(np.asarray(z[:, p]), z_ref, atol=2e-5)


def test_bf16_trunk_close_to_fp32(cfg, small_hierarchy, small_human, batch):
    """The bf16 conv trunk (production numeric policy) must stay close to
    the fp32 trunk — identical architecture, same params."""
    from semantichuman_tpu.config import Config
    from tests.conftest import SMALL_MODEL_OVERRIDES
    cfg16 = Config.from_dict(
        {"model": dict(SMALL_MODEL_OVERRIDES, trunk_dtype="bfloat16")})
    m32 = build_model(cfg, small_hierarchy, small_human.part_dict)
    m16 = build_model(cfg16, small_hierarchy, small_human.part_dict)
    params = m32.init(0)
    x, kps = batch
    r32 = np.asarray(m32(params, x, kps)[0])
    r16 = np.asarray(m16(params, x, kps)[0])
    scale = np.abs(r32).max()
    assert np.abs(r16 - r32).max() / scale < 2e-2
