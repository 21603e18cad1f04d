"""Pin the roofline summary arithmetic (benchmarks/row_floor_roofline.py):
the derived-bound table in docs/BENCHMARKS.md rests on these formulas."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def rl():
    spec = importlib.util.spec_from_file_location(
        "row_floor_roofline",
        os.path.join(REPO, "benchmarks", "row_floor_roofline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summarize_single_conv(rl):
    # one conv: V1=1000, S=10, c=16, B=128 bf16 -> 10k rows, 40.96 MB fwd
    rec = [dict(kind="conv", v1=1000, s=10, rows=10_000, c=16, src1=1000,
                bc=128 * 16, bytes_per_row=128 * 16 * 2)]
    s = rl.summarize(rec, 128)
    assert s["rows_fwd"] == 10_000
    assert s["rows_fwd_plus_bwd"] == 20_000
    assert s["gathered_gb_fwd"] == pytest.approx(0.041, abs=0.001)
    # issue floor: 20k rows * 100 ns = 2 ms
    assert s["t_issue_floor_ms"] == pytest.approx(2.0, rel=1e-6)
    # bandwidth floor at 160 GB/s: 0.08192 GB / 160 GB/s = 0.512 ms
    assert s["t_bandwidth_floor_ms_at_160gbs"] == pytest.approx(0.51,
                                                                abs=0.01)
    # two-regime per-op max -> the issue regime binds here
    assert s["t_two_regime_gather_bound_ms"] == pytest.approx(2.0, rel=1e-6)
    # MXU term: 5.43 GFLOP/mesh * 128 / 197 TFLOP/s = 3.53 ms
    assert s["t_mxu_ms"] == pytest.approx(3.53, abs=0.01)
    # full bound = gather + mxu + measured losses (B=128: scale factor 1)
    want_full = 2.0 + s["t_mxu_ms"] + rl.MEASURED_LOSS_MS + \
        rl.MEASURED_VOL_MS
    assert s["bound_full_step_ms"] == pytest.approx(want_full, abs=0.01)
    assert s["bound_full_step_mps"] == pytest.approx(
        128 / want_full * 1e3, abs=0.5)
    # achieved comparison present for the headline batch (r5 session bench)
    assert s["achieved_mps"] == 642.0


def test_summarize_bandwidth_regime(rl):
    # a WIDE-row op (few rows, huge bytes) must bind on bandwidth
    rec = [dict(kind="unpool", v1=100, s=3, rows=300, c=512, src1=50,
                bc=1024 * 512, bytes_per_row=1024 * 512 * 4)]
    s = rl.summarize(rec, 128)
    # 300 rows * 100 ns = 0.03 ms issue vs 2*0.629GB/160 GB/s = 7.86 ms
    assert s["t_two_regime_gather_bound_ms"] > 5.0
    assert s["t_two_regime_gather_bound_ms"] == pytest.approx(
        s["t_bandwidth_floor_ms_at_160gbs"], rel=1e-6)


def test_banded_ceiling_monotone(rl):
    """The banded predicted ceiling must beat the gather bound whenever the
    gate routes banding — the r4-measured region is SMALL batch (conv cap
    `_BANDED_MAX_B`), where the row floor dominates and the selection
    matmul is cheap."""
    rec = [dict(kind="conv", v1=6893, s=15, rows=103_395, c=16, src1=6893,
                bc=16 * 16, bytes_per_row=16 * 16 * 2)]
    s = rl.summarize(rec, 16)
    assert s["n_banded_ops"] == 1
    assert s["banded_gather_bound_ms"] < s["t_two_regime_gather_bound_ms"]


def test_banded_ceiling_dispatch_aware(rl):
    """The ceiling models the SHIPPED dispatch (r4 on-chip caps): a fine
    conv at B=128 stays on the take path (banding refuted above
    `_BANDED_MAX_B`=16), a coarse conv never bands (V1 < BAND_MIN_V1),
    and an unpool bands up to `_UNPOOL_BAND_MAX_B`=128 but not above."""
    coarse = [dict(kind="conv", v1=1724, s=8, rows=13_792, c=32, src1=1724,
                   bc=128 * 32, bytes_per_row=128 * 32 * 2)]
    s = rl.summarize(coarse, 128)
    assert s["n_banded_ops"] == 0
    assert s["banded_gather_bound_ms"] == pytest.approx(
        s["t_two_regime_gather_bound_ms"], rel=1e-6)
    fine = [dict(kind="conv", v1=6893, s=15, rows=103_395, c=16, src1=6893,
                 bc=128 * 16, bytes_per_row=128 * 16 * 2)]
    s2 = rl.summarize(fine, 128)
    assert s2["n_banded_ops"] == 0
    assert s2["banded_gather_bound_ms"] == pytest.approx(
        s2["t_two_regime_gather_bound_ms"], rel=1e-6)
    unpool = [dict(kind="unpool", v1=6893, s=3, rows=6893 * 3, c=16,
                   src1=3447, bc=128 * 16, bytes_per_row=128 * 16 * 4)]
    s3 = rl.summarize(unpool, 128)
    assert s3["n_banded_ops"] == 1
    assert s3["banded_gather_bound_ms"] < s3["t_two_regime_gather_bound_ms"]
    big = [dict(kind="unpool", v1=6893, s=3, rows=6893 * 3, c=16,
                src1=3447, bc=384 * 16, bytes_per_row=384 * 16 * 4)]
    s4 = rl.summarize(big, 384)
    assert s4["n_banded_ops"] == 0


def test_unpool_matmul_rows_fold_taps(rl):
    """The unpool operator folds its 3 barycentric taps into ONE matmul
    row (U = sum_k one_hot*w_k): its one-hot FLOPs are 2*Vf1*Vc1*bc, not
    3x that; its banded FLOPs are 2*Vf1*W*bc."""
    vf1, taps, c, b, vc1 = 1000, 3, 32, 4, 500
    rec = [dict(kind="unpool", v1=vf1, s=taps, rows=vf1 * taps, c=c,
                src1=vc1, bc=b * c, bytes_per_row=b * c * 4)]
    s = rl.summarize(rec, b)
    # routes one-hot at b=4, fine rows >= 512
    assert s["n_onehot_routed_ops"] == 1
    flops_bound_ms = (2 * 2 * vf1 * vc1 * (b * c) / 1e12
                      / rl.PEAK_TFLOPS * 1e3)          # fwd+bwd
    # streamed output buffer: [vf1, bc], write+read, fwd+bwd
    stream_ms = 2 * 2 * (vf1 * b * c * 4 / 1e9) / 819.0 * 1e3
    assert s["t_onehot_ops_bound_ms"] == pytest.approx(
        max(flops_bound_ms, stream_ms), abs=0.01)
    # banded: same fold — rows=vf1, W=512 preset, gb scaled by 1/taps
    big = [dict(kind="unpool", v1=vf1, s=taps, rows=vf1 * taps, c=c,
                src1=vc1, bc=128 * c, bytes_per_row=128 * c * 4)]
    s2 = rl.summarize(big, 128)
    assert s2["n_banded_ops"] == 1
    sel_ms = 2 * 2 * vf1 * 512 * (128 * c) / 1e12 / rl.PEAK_TFLOPS * 1e3
    gb_banded = vf1 * 128 * c * 4 / 1e9
    stream2_ms = 2 * 2 * gb_banded / 819.0 * 1e3
    assert s2["banded_gather_bound_ms"] == pytest.approx(
        max(sel_ms, stream2_ms), abs=0.01)


def test_small_batch_onehot_routing(rl):
    """At b<=16 a coarse conv routes through the one-hot form: zero gather
    rows, its cost modeled as the selection matmul."""
    rec = [dict(kind="conv", v1=1724, s=8, rows=13_792, c=32, src1=1724,
                bc=12 * 32, bytes_per_row=12 * 32 * 2)]
    s = rl.summarize(rec, 4)
    assert s["n_onehot_routed_ops"] == 1
    assert s["rows_fwd"] == 0
    assert s["t_two_regime_gather_bound_ms"] == 0.0
    assert s["t_onehot_ops_bound_ms"] > 0
    # an L0-sized conv (V1 > 2048) stays on the gather path at b=12
    rec2 = [dict(kind="conv", v1=6893, s=15, rows=103_395, c=16, src1=6893,
                 bc=12 * 16, bytes_per_row=12 * 16 * 2)]
    s2 = rl.summarize(rec2, 4)
    assert s2["n_onehot_routed_ops"] == 0
    assert s2["rows_fwd"] == 103_395
