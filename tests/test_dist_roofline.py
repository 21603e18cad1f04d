"""Pin the distance-loss VPU roofline (benchmarks/dist_loss_roofline.py):
the mirror functions must stay exactly equal to the real interpret-mode
Pallas kernels (else the op inventory silently models the wrong math), and
the summary arithmetic is the basis of the derived-bound table in
docs/BENCHMARKS.md."""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dl():
    spec = importlib.util.spec_from_file_location(
        "dist_loss_roofline",
        os.path.join(REPO, "benchmarks", "dist_loss_roofline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_count_ops_simple(dl):
    import jax
    import jax.numpy as jnp

    a = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    def f(x, y):
        return jnp.sum(x * y + x)

    c = dl.count_ops(f, a, a)
    # mul + add + reduce_sum, each touching 8*128 elements
    assert c["vpu_elem_ops"] == 3 * 8 * 128
    assert c["mxu_flops"] == 0

    def g(x, y):
        return jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())))

    c2 = dl.count_ops(g, a, a)
    assert c2["vpu_elem_ops"] == 0
    assert c2["mxu_flops"] == 2 * 8 * 8 * 128


def _tile_case(n_pad=16, seed=0):
    """Small two-program stack exercising masking (n_real < n_pad), the
    leaf allone flag, and an edit factor != 1."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    g = 2
    vp = np.zeros((g, n_pad, 128), np.float32)
    rp = np.zeros((g, n_pad, 128), np.float32)
    vp[:, :, :3] = rng.normal(size=(g, n_pad, 3))
    rp[:, :, :3] = rng.normal(size=(g, n_pad, 3))
    bone = np.zeros((g, 8, 128), np.float32)
    bone[:, 0, :3] = rng.normal(size=(g, 3))
    a = np.asarray([[1.0], [1.3]], np.float32)      # [P, B] with B=1
    n_real = np.asarray([n_pad - 3, n_pad - 1], np.int32)
    allone = np.asarray([0, 1], np.int32)
    return (jnp.asarray(vp), jnp.asarray(rp), jnp.asarray(bone),
            jnp.asarray(a), n_real, allone)


@pytest.mark.parametrize("fastacos", ["0", "1"])
@pytest.mark.parametrize("w_mode,relat", [("threshold", True),
                                          ("sin", False),
                                          ("all_one", True)])
def test_mirror_fwd_matches_interpret_kernel(dl, monkeypatch, w_mode, relat,
                                             fastacos):
    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd

    monkeypatch.setattr(pd, "_INTERPRET", True)
    monkeypatch.setenv("SH_TPU_DIST_FASTACOS", fastacos)
    vp, rp, bone, a, n_real, allone = _tile_case()
    out = np.asarray(pd.part_dist_sums(vp, rp, bone, a, n_real, allone,
                                       w_mode, 0.8, relat))
    for i in range(2):
        s, c = dl._mirror_fwd(vp[i], rp[i], bone[i, 0:1], n_real[i],
                              allone[i], a[i, 0], n_pad=vp.shape[1],
                              w_mode=w_mode, w_threshold=0.8, relat=relat)
        np.testing.assert_allclose(out[i, 0], np.asarray(s), rtol=1e-6)
        np.testing.assert_allclose(out[i, 1], np.asarray(c), rtol=0)


@pytest.mark.parametrize("fastacos", ["0", "1"])
@pytest.mark.parametrize("one_pass", [False, True])
def test_mirror_grads_match_interpret_kernel(dl, monkeypatch, one_pass,
                                             fastacos):
    import jax
    import jax.numpy as jnp

    from semantichuman_tpu.ops.pallas import part_dist_pallas as pd

    monkeypatch.setattr(pd, "_INTERPRET", True)
    monkeypatch.setenv("SH_TPU_DIST_ONEPASS", "1" if one_pass else "0")
    monkeypatch.setenv("SH_TPU_DIST_FASTACOS", fastacos)
    vp, rp, bone, a, n_real, allone = _tile_case()
    ct = 0.7

    def f(r):
        s = pd.part_dist_sums(vp, r, bone, a, n_real, allone,
                              "threshold", 0.8, True)
        return ct * jnp.sum(s[:, 0])

    drp = np.asarray(jax.grad(f)(rp))
    for i in range(2):
        want = dl._mirror_bwd(vp[i], rp[i], bone[i, 0:1], n_real[i],
                              allone[i], a[i, 0], jnp.float32(ct),
                              n_pad=vp.shape[1], w_mode="threshold",
                              w_threshold=0.8, relat=True)
        np.testing.assert_allclose(drp[i], np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # the one-pass mirror's g0 must equal bwd at ct=1
        _s, _c, g0 = dl._mirror_fwd_grad(
            vp[i], rp[i], bone[i, 0:1], n_real[i], allone[i], a[i, 0],
            n_pad=vp.shape[1], w_mode="threshold", w_threshold=0.8,
            relat=True)
        np.testing.assert_allclose(np.asarray(g0) * ct, np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_summarize_arithmetic(dl):
    buckets = [(16, 2)]
    meas = {"threshold": 2.0, "sin": 1.0, "all_one": 0.5}
    s = dl.summarize(buckets, batch=4, measured_fwd_ms=meas,
                     measured_step_loss_ms=50.0)
    assert s["grid"] == 2 * 4
    # calibration rate = threshold ops / threshold time
    r = s["vpu_ops_fwd"] / (meas["threshold"] * 1e-3)
    assert s["r_calibrated"] == round(r, -9)
    # two-kernel model: N_BRANCHES * (fwd + bwd + bwd matmul)
    want = dl.N_BRANCHES * (
        s["vpu_ops_fwd"] / r * 1e3 + s["vpu_ops_bwd"] / r * 1e3
        + s["mxu_flops_bwd"] / 1e12 / dl.PEAK_TFLOPS * 1e3)
    assert s["step_loss_model_two_kernel_ms"] == pytest.approx(want,
                                                               abs=0.05)
    # one-pass model: fwd_grad + its matmul + 3-pass g0 streaming
    g0_gb = 2 * 4 * 16 * 128 * 4 / 1e9
    assert s["g0_stream_gb_per_invocation"] == pytest.approx(g0_gb,
                                                             abs=1e-3)
    want1 = dl.N_BRANCHES * (
        s["vpu_ops_fwd_grad"] / r * 1e3
        + s["mxu_flops_fwd_grad"] / 1e12 / dl.PEAK_TFLOPS * 1e3
        + 3 * g0_gb / dl.HBM_STREAM_GBS * 1e3)
    assert s["step_loss_one_pass_ms"] == pytest.approx(want1, abs=0.05)
    assert s["one_pass_saving_ms"] == pytest.approx(
        s["step_loss_model_two_kernel_ms"] - s["step_loss_one_pass_ms"],
        abs=0.11)
    # op-mix ordering: threshold > sin > all_one
    m = s["vpu_ops_fwd_by_mode"]
    assert m["threshold"] > m["sin"] > m["all_one"]
    # bwd recomputes the tile then adds the gradient chain; one-pass does
    # fwd AND gradient work in one program
    assert s["vpu_ops_fwd_grad"] > s["vpu_ops_bwd"] > s["vpu_ops_fwd"]


def test_spec_anchor_constants(dl):
    # clock derived from the public 197 TFLOP/s bf16 peak: ~1.5 GHz
    assert 1.3 < dl.CLOCK_GHZ < 1.7
    assert dl.R_PEAK_4ALU == 4 * dl.R_SINGLE_ALU
