"""Editing-suite tests: latent edit ops + Editor end-to-end on the small
synthetic human (reference demo.py:75-114 capability parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantichuman_tpu.constants import NEWSKL_LIST, PART_LIST
from semantichuman_tpu.data.assets import BodyAssets
from semantichuman_tpu.edit import (Editor, interpolate_z, run_demo,
                                    scale_bone_length, scale_girth,
                                    style_transfer_z, transplant_orientation)
from semantichuman_tpu.models import build_model
from semantichuman_tpu.ops.skeleton import kps2skl
from semantichuman_tpu.topology.adjacency import unique_edges
from semantichuman_tpu.topology.obj_io import load_obj


@pytest.fixture(scope="module")
def editor(small_cfg, small_hierarchy, small_human):
    model = build_model(small_cfg, small_hierarchy, small_human.part_dict)
    params = model.init(0)
    assets = BodyAssets(
        template_verts=small_human.template_verts,
        template_faces=small_human.template_faces,
        j_regressor=small_human.J_regressor,
        part_dict=small_human.part_dict,
        girth_edges=small_human.girth_edges,
        girth_factors=small_human.girth_factors,
        edge_verts=unique_edges(small_human.template_faces))
    return Editor(model, params, assets)


@pytest.fixture(scope="module")
def meshes(small_human):
    return small_human.sample_meshes(4, seed=7).astype(np.float32)


# --- pure latent ops ---------------------------------------------------------

def test_scale_girth_touches_only_chosen_parts():
    z = jnp.ones((2, 17, 8))
    out = np.asarray(scale_girth(z, ["chest", "hip"], 2.0))
    chest, hip = PART_LIST.index("chest"), PART_LIST.index("hip")
    for p in range(17):
        expected = 2.0 if p in (chest, hip) else 1.0
        np.testing.assert_allclose(out[:, p], expected)


def test_transplant_orientation_swaps_dirs_keeps_lengths():
    rng = np.random.default_rng(0)
    skl = jnp.asarray(rng.standard_normal((2, len(NEWSKL_LIST), 4)))
    donor = jnp.asarray(rng.standard_normal((2, len(NEWSKL_LIST), 4)))
    bones = [3, 5]
    out = np.asarray(transplant_orientation(skl, donor, bones))
    np.testing.assert_allclose(out[:, bones, :3],
                               np.asarray(donor)[:, bones, :3])
    np.testing.assert_allclose(out[..., 3], np.asarray(skl)[..., 3])
    keep = [i for i in range(len(NEWSKL_LIST)) if i not in bones]
    np.testing.assert_allclose(out[:, keep], np.asarray(skl)[:, keep])


def test_scale_bone_length():
    skl = jnp.ones((1, len(NEWSKL_LIST), 4))
    out = np.asarray(scale_bone_length(skl, [2, 4], 1.5))
    assert out[0, 2, 3] == pytest.approx(1.5)
    assert out[0, 3, 3] == pytest.approx(1.0)
    np.testing.assert_allclose(out[..., :3], 1.0)  # dirs untouched


def test_style_transfer_keeps_norm_takes_direction():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((3, 17, 8)))
    donor = jnp.asarray(rng.standard_normal((3, 17, 8)))
    out = np.asarray(style_transfer_z(z, donor))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(np.asarray(z), axis=-1),
                               rtol=1e-5)
    cos = np.sum(out * np.asarray(donor), axis=-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(np.asarray(donor),
                                                      axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_interpolate_endpoints():
    a, b = jnp.zeros((1, 17, 8)), jnp.ones((1, 17, 8))
    np.testing.assert_allclose(np.asarray(interpolate_z(a, b, 0.0)), 0.0)
    np.testing.assert_allclose(np.asarray(interpolate_z(a, b, 1.0)), 1.0)
    np.testing.assert_allclose(np.asarray(interpolate_z(a, b, 0.25)), 0.25)


# --- Editor end-to-end -------------------------------------------------------

def test_editor_reconstruct_shape(editor, meshes):
    rec = editor.reconstruct(meshes)
    assert rec.shape == meshes.shape
    assert np.all(np.isfinite(rec))


def test_editor_identity_edit_matches_reconstruction(editor, meshes):
    rec = editor.reconstruct(meshes)
    girth1 = editor.edit_girth(meshes, ["chest"], 1.0)
    np.testing.assert_allclose(girth1, rec, atol=1e-5)


def test_editor_girth_edit_changes_output(editor, meshes):
    rec = editor.reconstruct(meshes)
    edited = editor.edit_girth(meshes, ["chest", "abdomen", "hip"], 1.5)
    assert np.max(np.abs(edited - rec)) > 1e-6


def test_editor_orientation_transplant_runs(editor, meshes):
    donor = np.roll(meshes, 1, axis=0)
    out = editor.edit_orientation(meshes, donor, [14, 15])
    assert out.shape == meshes.shape and np.all(np.isfinite(out))


def test_editor_bone_length_scales_kps(editor, meshes):
    """The keypoint-space edit itself must scale bone lengths exactly."""
    lat = editor.encode(meshes)
    skl = kps2skl(lat["kps_full"], "ori_m")
    edited = scale_bone_length(skl, [4, 7], 1.2)
    np.testing.assert_allclose(np.asarray(edited[:, 4, 3]),
                               np.asarray(skl[:, 4, 3]) * 1.2, rtol=1e-6)
    out = editor.edit_bone_length(meshes, [4, 7], 1.2)
    assert out.shape == meshes.shape and np.all(np.isfinite(out))


def test_editor_interpolation_sequence(editor, meshes):
    seq = editor.interpolate(meshes[:2], np.roll(meshes[:2], 1, axis=0),
                             [0.0, 0.5, 1.0])
    assert seq.shape == (3, 2) + meshes.shape[1:]
    assert np.all(np.isfinite(seq))


def test_run_demo_exports_objs(editor, meshes, tmp_path):
    out = run_demo(editor, meshes, str(tmp_path))
    assert set(out) == {"rec", "ori", "bonelen", "girth", "style"}
    for name in out:
        path = tmp_path / f"sample0_{name}.obj"
        assert path.exists()
        v, f = load_obj(str(path))
        # mesh vertices + skeleton strip points; faces reference the mesh
        assert len(v) >= meshes.shape[1]
        assert f.max() < meshes.shape[1]


def test_editor_measure(editor, meshes):
    m = editor.measure(meshes)
    assert m.shape == (len(meshes), 32)
    assert np.all(m > 0) and np.all(np.isfinite(m))
    # girths of a uniformly scaled body scale linearly
    m2 = editor.measure(meshes * 2.0)
    np.testing.assert_allclose(m2, 2.0 * m, rtol=1e-5)
