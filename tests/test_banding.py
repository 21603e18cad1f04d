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

    assert not SC._banded_ok()
    out_cpu = SC.spiral_conv(*args, "elu", band=spec)
    ref = SC.spiral_conv_take(*args, "elu")
    np.testing.assert_array_equal(np.asarray(out_cpu), np.asarray(ref))

    monkeypatch.setattr(SC, "_banded_ok", lambda: True)
    out_banded = SC.spiral_conv(*args, "elu", band=spec)
    np.testing.assert_array_equal(np.asarray(out_banded), np.asarray(ref))


def test_banded_model_forward_matches(small_hierarchy, small_human,
                                      monkeypatch):
    """A PartAE built with banded tables (gate forced on, presets scaled to
    the small topology) reproduces the plain model's forward bitwise."""
    from semantichuman_tpu.constants import KPS_INDEX_LIST
    from semantichuman_tpu.models import tables as tables_mod
    from semantichuman_tpu.models.part_ae import PartAE

    hier = small_hierarchy
    coarse = hier.downsample_part_indices(small_human.part_dict)
    plain = tables_mod.device_tables(hier)
    monkeypatch.setattr(tables_mod, "BAND_MIN_V1", 1)
    monkeypatch.setattr("semantichuman_tpu.ops.banding.BAND_PRESETS",
                        ((8, 32), (16, 64)))
    monkeypatch.setattr("semantichuman_tpu.ops.banding.MAX_OOB_FRAC", 1.0)
    banded = tables_mod.device_tables(hier, banded=True)
    assert any(b is not None for b in banded.bands)
    monkeypatch.setattr(SC, "_banded_ok", lambda: True)

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
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
