"""Loss-stack golden tests: vectorized device losses vs naive NumPy
re-derivations of the reference formulas (train_funcs.py, utils_SH.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantichuman_tpu.constants import (KPS_KEEP, LEAF_PART_INDICES,
                                         N_PARTS, NOLEAF_IN_MEASURE,
                                         NOLEAF_PART_INDICES, SKL_LIST)
from semantichuman_tpu.train import losses as L
from semantichuman_tpu.ops import skeleton as S

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def tables(small_human):
    return L.build_loss_tables(small_human.template_faces,
                               small_human.J_regressor,
                               small_human.part_dict)


@pytest.fixture(scope="module")
def data(small_human):
    meshes = small_human.sample_meshes(4, seed=11).astype(np.float32)
    rec = (meshes + RNG.normal(0, 0.01, meshes.shape)).astype(np.float32)
    measure = small_human.measures(meshes).astype(np.float32)
    kps = np.einsum("jv,bvd->bjd",
                    small_human.J_regressor, meshes).astype(np.float32)
    return meshes, rec, measure, kps


def test_edgereg_matches_naive(tables, data):
    tx, rec, _, _ = data
    got = float(L.edgereg_loss(jnp.asarray(tx), jnp.asarray(rec),
                               jnp.asarray(tables.faces)))
    f = tables.faces
    total = 0.0
    for b in range(len(tx)):
        # per-sample: target edges from GT (+1e-5), score = mean |pred/t - 1|
        def edges(v):
            return np.stack([
                np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1),
                np.linalg.norm(v[f[:, 1]] - v[f[:, 2]], axis=1),
                np.linalg.norm(v[f[:, 0]] - v[f[:, 2]], axis=1)])
        t = edges(tx[b]) + 1e-5
        p = edges(rec[b])
        total += np.mean(np.abs(p / t - 1.0))
    np.testing.assert_allclose(got, total / len(tx), rtol=1e-4)


def test_zpartreg_matches_naive(data):
    _, _, measure, _ = data
    z = RNG.normal(0, 1, (4, 17, 8)).astype(np.float32)
    got = float(L.zpartreg_loss(jnp.asarray(z), jnp.asarray(measure), True))
    zn = np.linalg.norm(z, axis=2)[:, NOLEAF_PART_INDICES]
    m = measure[:, NOLEAF_IN_MEASURE]
    np.testing.assert_allclose(got, np.mean(np.abs(zn / m - 1.0)), rtol=1e-5)
    got_abs = float(L.zpartreg_loss(jnp.asarray(z), jnp.asarray(measure),
                                    False))
    np.testing.assert_allclose(got_abs, np.mean(np.abs(zn - m)), rtol=1e-5)


def test_volume_matches_naive(tables, data, small_human):
    tx, rec, _, _ = data
    got = float(L.volume_loss(jnp.asarray(tx), jnp.asarray(rec), tables))
    # naive per-sample/per-part signed volumes over wholly-inside faces
    part_of = np.full(tx.shape[1], -1)
    for k, idx in enumerate(small_human.part_dict.values()):
        part_of[idx] = k
    f = tables.faces
    fp = part_of[f]
    vals = []
    for b in range(len(tx)):
        for p in NOLEAF_PART_INDICES:
            sel = (fp[:, 0] == p) & (fp[:, 1] == p) & (fp[:, 2] == p)
            ff = f[sel]
            rv = np.sum(np.cross(rec[b][ff[:, 0]], rec[b][ff[:, 1]])
                        * rec[b][ff[:, 2]])
            gv = np.sum(np.cross(tx[b][ff[:, 0]], tx[b][ff[:, 1]])
                        * tx[b][ff[:, 2]])
            vals.append(abs(abs(rv / gv) - 1.0))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-3)


def _naive_weighted_distance(tx, rec, kps_full, part_indices, a_full,
                             edited, w_mode, w_thresh, w_part_mode, relat,
                             leafkeep):
    total = 0.0
    point_num = tx.shape[1]
    n_edited = edited.sum()
    for i, idx in enumerate(part_indices):
        vp = tx[:, idx]
        vr = rec[:, idx]
        # angle weights
        bone_def = SKL_LIST[i]
        b0 = kps_full[:, bone_def[0]]
        b1 = (kps_full[:, bone_def[1]] if len(bone_def) == 2 else
              0.5 * (kps_full[:, bone_def[1]] + kps_full[:, bone_def[2]]))
        bone = b0 - b1
        d = vp[:, :, None] - vp[:, None, :]
        dn = np.linalg.norm(d, axis=-1)
        bn = np.linalg.norm(bone, axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.abs(np.einsum("bijk,bk->bij", d, bone)) / (
                dn * bn[:, None, None])
        cos = np.where(np.isnan(cos), 1.0, np.clip(cos, 0, 1))
        ang = np.degrees(np.arccos(cos))
        if w_mode == "all_one" or (leafkeep and i in LEAF_PART_INDICES):
            w = np.ones_like(ang)
        elif w_mode == "linear":
            w = ang / 90.0
        elif w_mode == "threshold":
            w = ang / 90.0
            w = np.where(w < w_thresh, 0.0, w)
        for b in range(w.shape[0]):
            np.fill_diagonal(w[b], 0.0)
        de = np.linalg.norm(vp[:, :, None] - vp[:, None, :], axis=-1)
        de = de * a_full[:, i][:, None, None]
        de_r = np.linalg.norm(vr[:, :, None] - vr[:, None, :], axis=-1)
        nz = (w * de) != 0
        if relat:
            li = np.mean(np.abs(w[nz] * de_r[nz] / de[nz] - w[nz]))
        else:
            li = np.mean(np.abs(w[nz] * de_r[nz] - w[nz] * de[nz]))
        if w_part_mode == "n/N":
            wp = len(idx) / point_num
        elif w_part_mode == "1/K":
            wp = 1.0 / N_PARTS
        elif w_part_mode == "1/rand_num":
            wp = (0.99 / n_edited if edited[i] else
                  0.01 / (N_PARTS - n_edited))
        total += wp * li
    return total


@pytest.mark.parametrize("w_mode,w_part_mode,relat", [
    ("threshold", "1/K", True),
    ("linear", "n/N", False),
    ("all_one", "1/rand_num", True),
])
def test_weighted_distance_matches_naive(tables, data, w_mode, w_part_mode,
                                         relat):
    tx, rec, _, kps = data
    a_full = np.ones((4, 17), dtype=np.float32)
    edited = np.zeros(17, dtype=np.float32)
    for p in (2, 3, 4):
        a_full[:, p] = 1.1
        edited[p] = 1.0
    got = float(L.weighted_distance_loss(
        jnp.asarray(tx), jnp.asarray(rec), jnp.asarray(kps), tables,
        a_full=jnp.asarray(a_full), edited_mask=jnp.asarray(edited),
        n_edited=jnp.float32(3.0), w_mode=w_mode, w_threshold=0.8,
        w_part_mode=w_part_mode, relat=relat, leafkeep=True))
    want = _naive_weighted_distance(
        tx, rec, kps, tables.part_indices, a_full, edited, w_mode, 0.8,
        w_part_mode, relat, True)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_kps2skl_skl2kps_roundtrip(data):
    _, _, _, kps = data
    # zero-root the keypoints (the framework's normalization) so the
    # integration from the root reproduces them exactly
    kps0 = kps - kps[:, :1, :]
    kept = jnp.asarray(kps0[:, KPS_KEEP])
    skl = S.kps2skl(kept, "ori_m")
    back = S.skl2kps(skl, "ori_m")
    np.testing.assert_allclose(np.asarray(back), kps0[:, KPS_KEEP],
                               atol=2e-5)
    # vec_m mode roundtrip
    back2 = S.skl2kps(S.kps2skl(kept, "vec_m"), "vec_m")
    np.testing.assert_allclose(np.asarray(back2), kps0[:, KPS_KEEP],
                               atol=2e-5)
    # length mode equals norms
    skl_m = S.kps2skl(kept, "m")
    np.testing.assert_allclose(np.asarray(skl_m)[..., 0],
                               np.asarray(skl)[..., 3], atol=1e-5)


def test_edit_skl_moves_subtree():
    kps = np.zeros((1, 24, 3), dtype=np.float32)
    # simple chain along y for SMPL joints 0-1-4-7-10 (left leg)
    for chain, y in zip([0, 1, 4, 7, 10], [0.0, -0.1, -0.5, -0.9, -1.0]):
        kps[0, chain, 1] = y
    out = np.asarray(S.edit_skl(jnp.asarray(kps), 4, jnp.asarray([1.5])))
    # joint 4 and descendants (7, 10) translated by 0.5*(kps4-kps1)
    delta = 0.5 * (kps[0, 4] - kps[0, 1])
    np.testing.assert_allclose(out[0, 4], kps[0, 4] + delta, atol=1e-6)
    np.testing.assert_allclose(out[0, 7], kps[0, 7] + delta, atol=1e-6)
    np.testing.assert_allclose(out[0, 10], kps[0, 10] + delta, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], kps[0, 1], atol=1e-6)
    np.testing.assert_allclose(out[0, 0], kps[0, 0], atol=1e-6)


def test_angle_weights_geometry():
    # one part of 3 collinear+orthogonal points, bone along x
    verts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float32)
    kps = np.zeros((1, 35, 3), dtype=np.float32)
    kps[0, SKL_LIST[0][0], 0] = 1.0   # bone = +x
    angs = S.angle_weights(jnp.asarray(verts), jnp.asarray(kps),
                           [np.array([0, 1, 2])], [SKL_LIST[0]])
    a = np.asarray(angs[0])[0]
    assert abs(a[0, 1]) < 1e-4            # pair along bone -> 0 deg
    assert abs(a[0, 2] - 90.0) < 1e-4     # orthogonal pair -> 90 deg
    assert abs(a[0, 0]) < 1e-4            # self pair (nan) -> 0 deg


def test_edge_loss_zero_on_identity(small_human):
    from semantichuman_tpu.topology.adjacency import unique_edges
    import semantichuman_tpu.train.losses as L2
    v = jnp.asarray(small_human.sample_meshes(2, seed=0), jnp.float32)
    e = unique_edges(small_human.template_faces)
    assert float(L2.edge_loss(v, v, e)) == 0.0
    stretched = v * 1.1
    assert float(L2.edge_loss(v, stretched, e)) > 0.0


def test_average_value_meter():
    from semantichuman_tpu.utils.logging import AverageValueMeter
    m = AverageValueMeter()
    for x in [1.0, 2.0, 3.0, 4.0]:
        m.add(x)
    assert m.mean == pytest.approx(2.5)
    assert m.std == pytest.approx(np.std([1, 2, 3, 4], ddof=1))


def test_step_timer():
    import time as _t
    from semantichuman_tpu.utils.profiling import StepTimer
    t = StepTimer(skip_first=1)
    for _ in range(4):
        with t:
            _t.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3                 # first (compile) step dropped
    assert 0.005 < s["mean_s"] < 0.1
    assert s["p50_s"] <= s["max_s"]


def test_precomputed_gt_inputs_match_inline(tables, data):
    """The staged GT loss inputs (data.device_data precompute) must yield
    the same loss values the in-step fallback computes: edge lengths are
    elementwise (bitwise), part volumes match up to f32 reduction order."""
    from semantichuman_tpu.ops.distance import (face_edge_lengths,
                                                signed_part_volumes)
    tx, rec, _, _ = data
    txj, recj = jnp.asarray(tx), jnp.asarray(rec)
    faces = jnp.asarray(tables.faces)
    gt_e = face_edge_lengths(txj, faces)
    np.testing.assert_array_equal(
        np.asarray(L.edgereg_loss(txj, recj, faces, gt_edges=gt_e)),
        np.asarray(L.edgereg_loss(txj, recj, faces)))
    gt_v = signed_part_volumes(txj, faces,
                               jnp.asarray(tables.face_part_mask))
    np.testing.assert_allclose(
        float(L.volume_loss(txj, recj, tables, gt_vols=gt_v)),
        float(L.volume_loss(txj, recj, tables)), rtol=1e-6)
