"""Exactness pins for the Pallas block-diagonal banded gather
(ops/pallas/banded_gather_pallas.py) against the plain take gather, in
interpret mode on the CPU mesh — covering the raw kernel (fwd/bwd,
weighted and not, h-split geometries), the spec builder's invariants, and
the conv/unpool integration forms the dispatch gates route to."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib

sc = importlib.import_module("semantichuman_tpu.ops.spiral_conv")
from semantichuman_tpu.ops import banding as bd
from semantichuman_tpu.ops import sampling
from semantichuman_tpu.ops.pallas import banded_gather_pallas as bg


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(bg, "_INTERPRET", True)


def _synth_table(n, s, spread, seed=0, far_frac=0.02):
    """Local-ish index table with dummy pads and a few far entries (the
    out-of-band fixup path)."""
    rng = np.random.default_rng(seed)
    dummy = n - 1
    tbl = np.clip(np.arange(n)[:, None] + rng.integers(-spread, spread,
                                                       (n, s)), 0, n - 1)
    tbl[rng.random((n, s)) < 0.3] = dummy
    far = rng.random((n, s)) < far_frac
    tbl[far] = rng.integers(0, n, far.sum())
    return tbl.astype(np.int32), dummy


def _gather_pair(tbl, spec, m=24, seed=1):
    rng = np.random.default_rng(seed)
    n = tbl.shape[0]
    xp = rng.normal(size=(n, m)).astype(np.float32)
    xp[n - 1] = 0.0        # the dummy source row is zero by construction

    def ref(x):
        return jnp.take(x, jnp.asarray(tbl.reshape(-1)), axis=0)

    def ker(x):
        g = bg.diag_banded_gather(x, None, spec)
        return g.at[jnp.asarray(spec.fix_pos)].add(
            jnp.take(x, jnp.asarray(spec.fix_src), axis=0))

    return jnp.asarray(xp), ref, ker


def test_spec_builder_invariants():
    tbl, dummy = _synth_table(600, 5, 150)
    spec = bd.build_diag_spec(tbl, 128, 4, dummy=dummy)
    # base monotone (the backward's contiguous-run construction needs it)
    assert (np.diff(spec.base) >= 0).all()
    # every non-dummy entry is either in the diagonal window or fixed up
    n_fix = (spec.fix_src != dummy).sum()
    in_band = (spec.rel.reshape(-1) >= 0).sum()
    n_real = (tbl != dummy).sum()
    # in-band counts include dummy entries that happen to land in range
    assert in_band + n_fix >= n_real
    # source blocks padded by K on both sides
    assert spec.n_src_blocks == -(-spec.n_src // spec.R) + 2 * spec.K


@pytest.mark.parametrize("n,s,R,K", [(600, 5, 128, 4),
                                     (600, 15, 128, 4),   # forces h-split
                                     (300, 3, 64, 3)])
def test_kernel_matches_take(n, s, R, K):
    tbl, dummy = _synth_table(n, s, 150)
    spec = bd.build_diag_spec(tbl, R, K, dummy=dummy)
    xj, ref, ker = _gather_pair(tbl, spec)
    np.testing.assert_array_equal(np.asarray(ker(xj)), np.asarray(ref(xj)))
    ct = jnp.asarray(np.random.default_rng(2).normal(
        size=(n * s, xj.shape[1])).astype(np.float32))
    dr = np.array(jax.grad(lambda x: jnp.sum(ref(x) * ct))(xj))
    dk = np.array(jax.grad(lambda x: jnp.sum(ker(x) * ct))(xj))
    # the producing op re-zeroes the dummy row's cotangent downstream
    dr[dummy] = 0
    dk[dummy] = 0
    np.testing.assert_allclose(dk, dr, rtol=1e-5, atol=1e-5)


def test_kernel_weighted_matches_take():
    n, s, R, K = 300, 3, 64, 3
    rng = np.random.default_rng(3)
    dummy = n - 1
    tbl = np.clip(np.arange(n)[:, None] // 2
                  + rng.integers(-30, 30, (n, s)), 0, n - 1).astype(np.int32)
    w = rng.random((n, s)).astype(np.float32)
    spec = bd.build_diag_spec(tbl, R, K, dummy=dummy)
    w_pad = np.zeros((spec.nblk * R, s), np.float32)
    w_pad[:n] = w
    xp = rng.normal(size=(n, 16)).astype(np.float32)
    xp[dummy] = 0
    xj = jnp.asarray(xp)

    def ref(x):
        return (jnp.take(x, jnp.asarray(tbl.reshape(-1)), axis=0)
                * jnp.asarray(w.reshape(-1))[:, None])

    def ker(x):
        g = bg.diag_banded_gather(x, w_pad.reshape(spec.nblk, R * s), spec)
        fp = jnp.asarray(spec.fix_pos)
        fw = jnp.asarray(w.reshape(-1))[fp]
        return g.at[fp].add(fw[:, None]
                            * jnp.take(x, jnp.asarray(spec.fix_src), axis=0))

    np.testing.assert_allclose(np.asarray(ker(xj)), np.asarray(ref(xj)),
                               rtol=1e-6, atol=1e-6)
    ct = jnp.asarray(rng.normal(size=(n * s, 16)).astype(np.float32))
    dr = np.array(jax.grad(lambda x: jnp.sum(ref(x) * ct))(xj))
    dk = np.array(jax.grad(lambda x: jnp.sum(ker(x) * ct))(xj))
    dr[dummy] = 0
    dk[dummy] = 0
    np.testing.assert_allclose(dk, dr, rtol=1e-5, atol=1e-5)


def _small_band(tbl, dummy):
    spec = bd.pick_band_spec(tbl, presets=((64, 192),), max_oob=1.0,
                             dummy=dummy)
    assert spec is not None and spec.diag is not None
    return spec


def test_conv_integration_matches_take(monkeypatch):
    monkeypatch.setenv("SH_TPU_BANDED_PALLAS", "1")
    rng = np.random.default_rng(4)
    v1, s, c_in, c_out, b = 600, 9, 8, 16, 3
    tbl, dummy = _synth_table(v1, s, 80, seed=5)
    band = _small_band(tbl, dummy)
    x = rng.normal(size=(b, v1, c_in)).astype(np.float32)
    x[:, -1] = 0.0
    w = rng.normal(size=(s * c_in, c_out)).astype(np.float32) * 0.1
    bias = rng.normal(size=(c_out,)).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(tbl), jnp.asarray(w),
            jnp.asarray(bias))
    y_take = sc.spiral_conv_take(*args)
    y_pal = sc.spiral_conv_banded_pallas(args[0], args[1], band, args[2],
                                         args[3])
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_take),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, *a):
        return jnp.sum(fn(*a) ** 2)

    g_take = np.array(jax.grad(
        lambda xx: loss(sc.spiral_conv_take, xx, *args[1:]))(args[0]))
    g_pal = np.array(jax.grad(lambda xx: loss(
        lambda x_, t_, w_, b_: sc.spiral_conv_banded_pallas(
            x_, t_, band, w_, b_), xx, *args[1:]))(args[0]))
    # the structurally-zero dummy row's cotangent differs freely: the take
    # path accumulates into it, the kernel's sentinel discards it, and the
    # producing op's dummy re-zeroing throws it away either way (same
    # documented class as the XLA band)
    g_take[:, -1] = 0.0
    g_pal[:, -1] = 0.0
    np.testing.assert_allclose(g_pal, g_take, rtol=1e-4, atol=1e-5)


def test_unpool_integration_matches_take(monkeypatch):
    monkeypatch.setenv("SH_TPU_BANDED_PALLAS", "1")
    rng = np.random.default_rng(6)
    vf1, vc1, c, b = 600, 300, 8, 3
    dummy = vc1 - 1
    idx = np.clip(np.arange(vf1)[:, None] // 2
                  + rng.integers(-20, 20, (vf1, 3)), 0, vc1 - 1)
    idx[-1] = dummy
    idx = idx.astype(np.int32)
    w = rng.random((vf1, 3)).astype(np.float32)
    band = bd.pick_band_spec(idx, presets=((64, 192),), max_oob=1.0,
                             dummy=dummy)
    assert band is not None and band.diag is not None
    x = rng.normal(size=(b, vc1, c)).astype(np.float32)
    x[:, -1] = 0.0
    args = (jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w))
    y_take = sampling.unpool_take(*args)
    y_pal = sampling.unpool_banded_pallas(*args, band)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_take),
                               rtol=1e-5, atol=1e-5)
    g_take = jax.grad(lambda xx: jnp.sum(
        sampling.unpool_take(xx, args[1], args[2]) ** 2))(args[0])
    g_pal = jax.grad(lambda xx: jnp.sum(
        sampling.unpool_banded_pallas(xx, args[1], args[2], band) ** 2))(
            args[0])
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_take),
                               rtol=1e-4, atol=1e-5)


def test_gate_requires_env_and_diag(monkeypatch):
    tbl, dummy = _synth_table(600, 5, 80, seed=7)
    band = _small_band(tbl, dummy)
    monkeypatch.setenv("SH_TPU_BANDED_PALLAS", "0")
    assert not sc._banded_pallas_ok(band)
    from dataclasses import replace
    monkeypatch.setenv("SH_TPU_BANDED_PALLAS", "1")
    assert not sc._banded_pallas_ok(replace(band, diag=None))
    assert not sc._banded_pallas_ok(None)
