"""Pallas fused spiral-conv kernel: math validated in interpret mode on CPU
(the real-TPU path is probe-gated at runtime, see
ops/pallas/spiral_conv_pallas.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantichuman_tpu.ops.spiral_conv import spiral_conv
from semantichuman_tpu.ops.pallas.spiral_conv_pallas import (
    spiral_conv_auto, spiral_conv_fused)


@pytest.mark.parametrize("activation", ["elu", "relu", "identity"])
def test_fused_kernel_matches_xla_interpret(activation):
    rng = np.random.default_rng(0)
    b, v1, s, c, co = 2, 40, 6, 8, 16
    x = rng.standard_normal((b, v1, c)).astype(np.float32)
    x[:, -1] = 0.0                                    # dummy row
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)

    ref = spiral_conv(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                      jnp.asarray(bias), activation)
    got = spiral_conv_fused(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                            jnp.asarray(bias), activation, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got)[:, -1], 0.0)


def test_auto_path_always_correct():
    """spiral_conv_auto must be numerically right whichever backend the
    probe picks on this platform."""
    rng = np.random.default_rng(1)
    b, v1, s, c, co = 3, 30, 5, 4, 8
    x = rng.standard_normal((b, v1, c)).astype(np.float32)
    x[:, -1] = 0.0
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    ref = spiral_conv(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                      jnp.asarray(bias), "elu")
    got = spiral_conv_auto(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                           jnp.asarray(bias), "elu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


# --- fused weighted-distance loss (ops/pallas/part_dist_pallas.py) -----------

@pytest.fixture()
def _interpret_part_dist():
    import semantichuman_tpu.ops.pallas.part_dist_pallas as PD
    old = PD._INTERPRET
    PD._INTERPRET = True
    yield
    PD._INTERPRET = old


@pytest.fixture(scope="module")
def _dist_case(small_human):
    from semantichuman_tpu.train import losses as L
    tables = L.build_loss_tables(small_human.template_faces,
                                 small_human.J_regressor,
                                 small_human.part_dict)
    rng = np.random.default_rng(3)
    tx = small_human.sample_meshes(3, seed=5).astype(np.float32)
    rec = (tx + rng.normal(0, 0.01, tx.shape)).astype(np.float32)
    kps = np.einsum("jv,bvd->bjd",
                    small_human.J_regressor, tx).astype(np.float32)
    a_full = np.ones((3, 17), np.float32)
    edited = np.zeros(17, np.float32)
    for p in (1, 5):
        a_full[:, p] = 1.15
        edited[p] = 1.0
    return tables, tx, rec, kps, a_full, edited


@pytest.mark.parametrize("onepass", ["0", "1"])
@pytest.mark.parametrize("w_mode,w_part_mode,relat,leafkeep,with_a", [
    ("threshold", "1/K", True, True, True),
    ("linear", "n/N", False, True, False),
    ("sin", "1/K", True, False, True),
    ("all_one", "1/rand_num", True, True, True),
])
def test_fused_dist_matches_jnp(_interpret_part_dist, _dist_case,
                                monkeypatch, w_mode, w_part_mode, relat,
                                leafkeep, with_a, onepass):
    """Fused kernel (interpret mode) == jnp path: loss value AND grad wrt
    the reconstruction, across the w_mode x w_part_mode matrix — under
    BOTH VJP designs (SH_TPU_DIST_ONEPASS=1 is the shipped default;
    =0 is the documented two-kernel escape hatch and must stay pinned)."""
    import jax
    from semantichuman_tpu.train import losses as L
    tables, tx, rec, kps, a_full, edited = _dist_case
    monkeypatch.setenv("SH_TPU_DIST_ONEPASS", onepass)

    def loss(rec_j, fused):
        return L.weighted_distance_loss(
            jnp.asarray(tx), rec_j, jnp.asarray(kps), tables,
            a_full=jnp.asarray(a_full) if with_a else None,
            edited_mask=jnp.asarray(edited), n_edited=jnp.float32(2.0),
            w_mode=w_mode, w_threshold=0.8, w_part_mode=w_part_mode,
            relat=relat, leafkeep=leafkeep, fused=fused)

    rec_j = jnp.asarray(rec)
    v_ref, g_ref = jax.value_and_grad(lambda r: loss(r, False))(rec_j)
    v_fus, g_fus = jax.value_and_grad(lambda r: loss(r, True))(rec_j)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("onepass", ["0", "1"])
@pytest.mark.parametrize("relat", [True, False])
def test_fused_dist_fast_acos_matches_jnp(_interpret_part_dist, _dist_case,
                                          monkeypatch, relat, onepass):
    """SH_TPU_DIST_FASTACOS=1 (threshold mode, w_threshold >= 0.67 only)
    drops the arcsin range reduction: surviving weights are bit-identical
    (cos <= 0.5 takes the same Taylor branch either way) and pairs with
    cos > 0.5 are zeroed by the same threshold compare, so value and grad
    must equal the jnp path exactly like the slow path does — under both
    VJP designs."""
    import jax
    from semantichuman_tpu.train import losses as L
    tables, tx, rec, kps, a_full, edited = _dist_case
    monkeypatch.setenv("SH_TPU_DIST_ONEPASS", onepass)
    monkeypatch.setenv("SH_TPU_DIST_FASTACOS", "1")

    def loss(rec_j, fused):
        return L.weighted_distance_loss(
            jnp.asarray(tx), rec_j, jnp.asarray(kps), tables,
            a_full=jnp.asarray(a_full), edited_mask=jnp.asarray(edited),
            n_edited=jnp.float32(2.0), w_mode="threshold", w_threshold=0.8,
            w_part_mode="1/K", relat=relat, leafkeep=True, fused=fused)

    rec_j = jnp.asarray(rec)
    v_ref, g_ref = jax.value_and_grad(lambda r: loss(r, False))(rec_j)
    v_fus, g_fus = jax.value_and_grad(lambda r: loss(r, True))(rec_j)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fast_acos_gate_conditions(monkeypatch):
    """The fast path must refuse w_mode != threshold and thresholds below
    the 2/3 validity bound even when the env asks for it."""
    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd
    monkeypatch.setenv("SH_TPU_DIST_FASTACOS", "1")
    assert pd._use_fast_acos("threshold", 0.8)
    assert pd._use_fast_acos("threshold", 0.67)
    assert not pd._use_fast_acos("threshold", 0.5)
    assert not pd._use_fast_acos("linear", 0.8)
    assert not pd._use_fast_acos("sin", 0.8)
    monkeypatch.setenv("SH_TPU_DIST_FASTACOS", "0")
    assert not pd._use_fast_acos("threshold", 0.8)


@pytest.mark.parametrize("w_mode,relat", [("threshold", True),
                                          ("sin", False)])
def test_fused_dist_one_pass_grad_matches(_interpret_part_dist, _dist_case,
                                          monkeypatch, w_mode, relat):
    """SH_TPU_DIST_ONEPASS=1 routes the VJP through the combined
    forward+gradient kernel (no backward recompute); value and grad must
    equal the jnp path exactly as the two-kernel design does."""
    import jax
    from semantichuman_tpu.train import losses as L
    tables, tx, rec, kps, a_full, edited = _dist_case
    monkeypatch.setenv("SH_TPU_DIST_ONEPASS", "1")

    def loss(rec_j, fused):
        return L.weighted_distance_loss(
            jnp.asarray(tx), rec_j, jnp.asarray(kps), tables,
            a_full=jnp.asarray(a_full), edited_mask=jnp.asarray(edited),
            n_edited=jnp.float32(2.0), w_mode=w_mode, w_threshold=0.8,
            w_part_mode="1/K", relat=relat, leafkeep=True, fused=fused)

    rec_j = jnp.asarray(rec)
    v_ref, g_ref = jax.value_and_grad(lambda r: loss(r, False))(rec_j)
    v_fus, g_fus = jax.value_and_grad(lambda r: loss(r, True))(rec_j)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_dist_probe_false_on_cpu():
    """The availability probe must report False on the CPU backend even when
    called mid-trace (a deferred pallas lowering error once made it
    misreport True from inside jit tracing, breaking every Trainer run)."""
    import jax
    from semantichuman_tpu.ops.pallas.part_dist_pallas import (
        fused_dist_available)
    assert jax.default_backend() == "cpu"
    assert fused_dist_available() is False

    def traced(_):
        assert fused_dist_available() is False
        return jnp.float32(0.0)

    jax.jit(traced)(jnp.zeros(()))


def test_vertex_major_conv_path_matches():
    """The narrow-channel vertex-major spiral_conv branch (c<=4, b>=32)
    must equal the batch-major formulation exactly."""
    rng = np.random.default_rng(9)
    v1, s, c, co = 50, 6, 3, 16
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    x32 = rng.standard_normal((32, v1, c)).astype(np.float32)
    x32[:, -1] = 0.0
    got = spiral_conv(jnp.asarray(x32), jnp.asarray(idx), jnp.asarray(w),
                      jnp.asarray(bias), "elu")
    # batch-major reference: same inputs at b=4 (below the layout switch),
    # replicated to 32 by tiling the batch
    ref_small = spiral_conv(jnp.asarray(x32[:4]), jnp.asarray(idx),
                            jnp.asarray(w), jnp.asarray(bias), "elu")
    np.testing.assert_allclose(np.asarray(got)[:4], np.asarray(ref_small),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got)[:, -1], 0.0)


def test_fused_dist_ragged_buckets_and_oversize(_interpret_part_dist,
                                                _dist_case, monkeypatch):
    """Uneven part sizes route through per-size kernel buckets, and parts
    above MAX_FUSED_N spill to the jnp formulation — the mix must equal the
    pure jnp path (value + grad)."""
    import dataclasses
    import jax
    import semantichuman_tpu.ops.pallas.part_dist_pallas as PD
    from semantichuman_tpu.train import losses as L
    tables, tx, rec, kps, a_full, edited = _dist_case

    # carve the same vertex set into 17 deliberately ragged parts
    n_verts = tx.shape[1]
    rng = np.random.default_rng(0)
    perm = rng.permutation(n_verts)
    cuts = np.sort(rng.choice(np.arange(8, n_verts - 8), 16, replace=False))
    ragged = tuple(np.sort(c).astype(np.int32)
                   for c in np.split(perm, cuts))
    assert len(ragged) == 17 and min(len(r) for r in ragged) >= 1
    tables_r = dataclasses.replace(tables, part_indices=ragged)

    monkeypatch.setattr(PD, "MAX_FUSED_N", 64)   # force oversize spill

    def loss(rec_j, fused):
        return L.weighted_distance_loss(
            jnp.asarray(tx), rec_j, jnp.asarray(kps), tables_r,
            a_full=jnp.asarray(a_full), w_mode="threshold", w_threshold=0.8,
            w_part_mode="1/K", relat=True, leafkeep=True, fused=fused)

    rec_j = jnp.asarray(rec)
    v_ref, g_ref = jax.value_and_grad(lambda r: loss(r, False))(rec_j)
    v_fus, g_fus = jax.value_and_grad(lambda r: loss(r, True))(rec_j)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    # sanity: the split actually exercised both routes
    ptab = PD.PartDistTables(ragged, True, "threshold")
    assert ptab.oversize_ids and len(ptab.buckets) > 1


def test_onehot_conv_path_matches(monkeypatch):
    """The small-batch coarse-level one-hot matmul path (b<=16, v1<=2048,
    non-CPU backend) must equal the naive gather formulation EXACTLY
    (selection sums one product of a 1.0 each); the dispatch gate must
    stay off on CPU, where the dense matmul is strictly slower."""
    rng = np.random.default_rng(11)
    v1, s, c, co = 300, 7, 32, 16
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    idx[:, 0] = np.arange(v1)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    x = rng.standard_normal((4, v1, c)).astype(np.float32)
    x[:, -1] = 0.0

    import jax

    import importlib

    # ops/__init__ re-exports the FUNCTION under the submodule's name, so
    # fetch the module itself to reach the dispatch gate
    SC = importlib.import_module("semantichuman_tpu.ops.spiral_conv")

    # on the CPU test backend the dispatch must keep the take path even
    # though the shape qualifies
    assert not SC._onehot_ok(4, v1)
    monkeypatch.setattr(SC, "_onehot_ok", lambda bb, vv: True)

    def take_formulation(dtype):
        xj = jnp.asarray(x)
        wj = jnp.asarray(w)
        if dtype is not None:
            xj = xj.astype(dtype)
            wj = wj.astype(dtype)
        g = jnp.take(xj, jnp.asarray(idx.reshape(-1)), axis=1)
        g = g.reshape(4, v1, s * c)
        y = jnp.dot(g, wj, preferred_element_type=jnp.float32)
        y = jax.nn.elu(y + jnp.asarray(bias).astype(y.dtype))
        return np.array(y.at[:, -1, :].set(0.0))

    for dtype in (None, jnp.bfloat16):
        got = spiral_conv(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                          jnp.asarray(bias), "elu", compute_dtype=dtype)
        np.testing.assert_array_equal(np.asarray(got),
                                      take_formulation(dtype))


def test_onehot_unpool_path_matches(monkeypatch):
    """The small-batch one-hot unpool (b<=16, V_f>=1024, non-CPU backend)
    must match the barycentric 3-gather within f32 reassociation noise (on
    CPU both run full f32; the dense matmul only reorders the 3-term
    weighted sum), fwd and grad; the dispatch gate must stay off on CPU."""
    import jax

    from semantichuman_tpu.ops import sampling as S

    rng = np.random.default_rng(3)
    vf1, vc1, c, b = 1100, 600, 32, 4
    idx = rng.integers(0, vc1, (vf1, 3)).astype(np.int32)
    idx[-1] = vc1 - 1                                # dummy -> coarse dummy
    w = rng.dirichlet(np.ones(3), vf1).astype(np.float32)
    x = rng.standard_normal((b, vc1, c)).astype(np.float32)

    def take_formulation(xj):
        g = jnp.take(xj, jnp.asarray(idx.reshape(-1)),
                     axis=1).reshape(xj.shape[0], vf1, 3, xj.shape[2])
        return jnp.einsum("bvkc,vk->bvc", g, jnp.asarray(w).astype(xj.dtype))

    # on the CPU test backend the dispatch must keep the take path even
    # though the shape qualifies (full-scale CPU parity pins 3e-8)
    assert b <= S._ONEHOT_MAX_B and vf1 >= S._ONEHOT_MIN_ROWS
    assert not S._onehot_ok(b, vf1)

    # force the dense path through the public entry to pin the dispatch
    monkeypatch.setattr(S, "_onehot_ok", lambda bb, vv: True)
    got = S.unpool(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w))
    ref = take_formulation(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # gradient parity through the dense path
    def loss(fn, xj):
        return jnp.sum(jnp.abs(fn(xj)))

    g_dense = jax.grad(lambda xj: loss(
        lambda v: S.unpool_dense(v, jnp.asarray(idx), jnp.asarray(w)), xj))(
            jnp.asarray(x))
    g_take = jax.grad(lambda xj: loss(take_formulation, xj))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_take),
                               rtol=1e-5, atol=1e-6)

    # bf16 input stays on the dense path and matches the take formulation
    xb = jnp.asarray(x, jnp.bfloat16)
    got_b = S.unpool_dense(xb, jnp.asarray(idx), jnp.asarray(w))
    ref_b = take_formulation(xb)
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(ref_b, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_onehot_pool_path_matches(monkeypatch):
    """The small-batch one-hot pool is a pure row selection, so on CPU
    (full-f32 matmul) it must be EXACT against take, fwd and grad; the
    dispatch gate must stay off on CPU."""
    import jax

    from semantichuman_tpu.ops import sampling as S

    rng = np.random.default_rng(5)
    vf1, vc1, c, b = 1100, 600, 16, 4
    pidx = rng.permutation(vf1)[:vc1].astype(np.int32)
    pidx[-1] = vf1 - 1                               # dummy -> fine dummy
    x = rng.standard_normal((b, vf1, c)).astype(np.float32)

    assert b <= S._ONEHOT_MAX_B and vf1 >= S._ONEHOT_MIN_ROWS
    assert not S._onehot_ok(b, vf1)

    monkeypatch.setattr(S, "_onehot_ok", lambda bb, vv: True)
    got = S.pool(jnp.asarray(x), jnp.asarray(pidx))
    ref = jnp.take(jnp.asarray(x), jnp.asarray(pidx), axis=1)
    # 1 nnz/row: no reassociation — bitwise equality on CPU
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def loss(fn, xj):
        return jnp.sum(jnp.abs(fn(xj)))

    g_dense = jax.grad(lambda xj: loss(
        lambda v: S.pool_dense(v, jnp.asarray(pidx)), xj))(jnp.asarray(x))
    g_take = jax.grad(lambda xj: loss(
        lambda v: jnp.take(v, jnp.asarray(pidx), axis=1), xj))(
            jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(g_dense), np.asarray(g_take))

    # bf16 input stays bf16 through the dense path
    xb = jnp.asarray(x, jnp.bfloat16)
    got_b = S.pool_dense(xb, jnp.asarray(pidx))
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_b, np.float32),
        np.asarray(jnp.take(xb, jnp.asarray(pidx), axis=1), np.float32))


def test_wide_channel_einsum_conv_path_matches():
    """The wide-channel large-batch einsum path (c_in >= 64, concrete
    b >= 32) must match the flat-reshape dot formulation within f32
    reassociation noise — same products, different contraction order
    (measured 1.3-2.0x fwd+bwd on the v5e,
    benchmarks/vertex_major_trunk_probe.py)."""
    import jax

    rng = np.random.default_rng(12)
    b, v1, s, c, co = 32, 300, 7, 64, 32
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    idx[:, 0] = np.arange(v1)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    x = rng.standard_normal((b, v1, c)).astype(np.float32)
    x[:, -1] = 0.0

    def flat_formulation(dtype):
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        if dtype is not None:
            xj, wj = xj.astype(dtype), wj.astype(dtype)
        g = jnp.take(xj, jnp.asarray(idx.reshape(-1)), axis=1)
        g = g.reshape(b, v1, s * c)
        y = jnp.dot(g, wj, preferred_element_type=jnp.float32)
        y = jax.nn.elu(y + jnp.asarray(bias).astype(y.dtype))
        return np.asarray(y.at[:, -1, :].set(0.0))

    for dtype in (None, jnp.bfloat16):
        got = spiral_conv(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                          jnp.asarray(bias), "elu", compute_dtype=dtype)
        np.testing.assert_allclose(np.asarray(got), flat_formulation(dtype),
                                   rtol=1e-4, atol=1e-5)

    # symbolic batch (serving export) must fall through to the
    # shape-polymorphic flat path — the export itself is the assertion
    from jax import export as jax_export

    bdim = jax_export.symbolic_shape("B")[0]
    fn = lambda xx: spiral_conv(xx, jnp.asarray(idx), jnp.asarray(w),
                                jnp.asarray(bias), "elu")
    jax_export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((bdim, v1, c), jnp.float32))
