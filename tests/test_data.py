"""Data-pipeline tests: normalization, loaders, file layout, prefetch."""

import os

import numpy as np
import pytest

from semantichuman_tpu.data.dataset import (ArraySource, BatchLoader,
                                            FileSource, MeshData,
                                            ShapeStats, normalize_batch,
                                            prefetch_to_device)


@pytest.fixture(scope="module")
def meshes(small_human):
    return small_human.sample_meshes(10, seed=9).astype(np.float32)


def test_normalize_zeroroot(meshes, small_human):
    out = normalize_batch(meshes, "zeroroot", small_human.J_regressor)
    root = np.einsum("v,bvd->bd", small_human.J_regressor[0], out)
    np.testing.assert_allclose(root, 0.0, atol=1e-5)


def test_normalize_zeromean(meshes):
    out = normalize_batch(meshes, "zeromean")
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)


def test_normalize_nan_scrub(meshes):
    bad = meshes.copy()
    bad[0, 0, 0] = np.nan
    out = normalize_batch(bad, "No")
    assert np.isfinite(out).all()


def test_normalize_gass_and_small(meshes):
    stats = ShapeStats(mean=meshes.mean(axis=0), std=meshes.std(axis=0) + 1e-6)
    out = normalize_batch(meshes, "gass", stats=stats)
    assert abs(out.mean()) < 0.2
    out2 = normalize_batch(meshes, "small")
    np.testing.assert_allclose(out2, meshes / 1.5, atol=1e-6)


def test_batch_loader_dummy_and_shuffle(meshes, small_human):
    src = ArraySource(meshes, small_human.measures(meshes).astype(np.float32))
    ld = BatchLoader(src, 4, shuffle=True, seed=1, drop_last=True,
                     normalization="zeroroot",
                     j_regressor=small_human.J_regressor)
    batches = list(ld)
    assert len(batches) == 2 == len(ld)
    b = batches[0]
    assert b["verts"].shape == (4, meshes.shape[1] + 1, 3)
    np.testing.assert_array_equal(b["verts"][:, -1, :], 0.0)   # dummy row
    assert b["measure"].shape == (4, 32)
    # deterministic under the same seed+epoch
    ld2 = BatchLoader(src, 4, shuffle=True, seed=1, drop_last=True,
                      normalization="zeroroot",
                      j_regressor=small_human.J_regressor)
    np.testing.assert_array_equal(batches[0]["idx"], list(ld2)[0]["idx"])
    # different epoch -> different order
    ld2.set_epoch(1)
    assert not np.array_equal(batches[0]["idx"], list(ld2)[0]["idx"])


def test_batch_loader_pad_final(meshes):
    src = ArraySource(meshes)
    ld = BatchLoader(src, 4, pad_final=True)
    batches = list(ld)
    assert batches[-1]["verts"].shape[0] == 4
    assert batches[-1]["pad"] == 2      # 10 = 4+4+2
    assert batches[0]["pad"] == 0


def test_file_layout_roundtrip(tmp_path, meshes, small_human):
    """preprocessing layout: per-sample npys + paths index (data_generation)."""
    root = tmp_path / "preprocessed"
    os.makedirs(root / "points_train")
    os.makedirs(root / "measure_train")
    measures = small_human.measures(meshes).astype(np.float32)
    names = []
    for i in range(len(meshes)):
        name = str(i).zfill(6)
        np.save(root / "points_train" / f"{name}.npy", meshes[i])
        np.save(root / "measure_train" / f"{name}.npy", measures[i])
        names.append(name)
    np.save(root / "paths_train.npy", names)
    src = FileSource(str(root), "train", measure=True)
    assert len(src) == 10
    got = src.take(np.array([3, 7]))
    np.testing.assert_allclose(got["verts"], meshes[[3, 7]], atol=1e-6)
    np.testing.assert_allclose(got["measure"], measures[[3, 7]], atol=1e-6)


def test_mesh_data_container(tmp_path, meshes, small_human):
    pre = tmp_path / "preprocessed"
    os.makedirs(pre)
    np.save(pre / "train.npy", meshes[:8])
    np.save(pre / "test.npy", meshes[8:])
    tdir = tmp_path / "template"
    os.makedirs(tdir)
    from semantichuman_tpu.topology.obj_io import save_obj
    save_obj(str(tdir / "template.obj"), small_human.template_verts,
             small_human.template_faces)
    md = MeshData(str(tmp_path), n_val=2)
    assert md.vertices_train.shape[0] == 6
    assert md.vertices_val.shape[0] == 2
    assert md.vertices_test.shape[0] == 2
    assert md.template_verts.shape == small_human.template_verts.shape
    np.testing.assert_array_equal(md.template_faces,
                                  small_human.template_faces)


def test_prefetch_to_device(meshes):
    src = ArraySource(meshes)
    ld = BatchLoader(src, 5)
    out = list(prefetch_to_device(iter(ld), size=2))
    assert len(out) == 2
    import jax
    assert isinstance(out[0]["verts"], jax.Array)


def test_prefetch_threaded_matches_inline(meshes):
    """The background-worker pipeline yields exactly the inline batches, in
    order (the host take+normalize work moves off the step critical path —
    reference equivalent: DataLoader(num_workers=4), main.py:213-237)."""
    src = ArraySource(meshes)

    def batches():
        return iter(BatchLoader(src, 4, shuffle=True, seed=7))

    inline = list(prefetch_to_device(batches(), size=2, threaded=False))
    threaded = list(prefetch_to_device(batches(), size=2, threaded=True))
    assert len(inline) == len(threaded)
    for a, b in zip(inline, threaded):
        np.testing.assert_array_equal(np.asarray(a["verts"]),
                                      np.asarray(b["verts"]))
        np.testing.assert_array_equal(a["idx"], b["idx"])


def test_prefetch_threaded_propagates_errors(meshes):
    def boom():
        yield {"verts": meshes[:2], "idx": np.arange(2)}
        raise RuntimeError("loader exploded")

    it = prefetch_to_device(boom(), size=2, threaded=True)
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(it)


def test_prefetch_threaded_early_abandon(meshes):
    """Breaking out of the generator must release the worker thread (no
    hang on a full queue)."""
    import threading

    n_before = threading.active_count()
    src = ArraySource(meshes)
    it = prefetch_to_device(iter(BatchLoader(src, 2)), size=1, threaded=True)
    next(it)
    it.close()
    import time
    for _ in range(50):                      # worker exits within 5 s
        if threading.active_count() <= n_before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= n_before


def test_normalize_normal_mode(meshes):
    """Per-sample per-axis bbox normalization ('normal', an eval-time mode:
    stats indexed by sample id — reference shape_data.py:44-47)."""
    stats = ShapeStats(
        center=(meshes.max(axis=1) + meshes.min(axis=1)) / 2,
        scale=1.0 / (meshes.max(axis=1) - meshes.min(axis=1)))
    idx = np.arange(len(meshes))
    out = normalize_batch(meshes, "normal", stats=stats, idx=idx)
    assert out.shape == meshes.shape              # regression: was (B,B,V,3)
    # each normalized sample sits in [-0.5, 0.5] per axis
    assert np.all(out.max(axis=1) <= 0.5 + 1e-6)
    assert np.all(out.min(axis=1) >= -0.5 - 1e-6)
    # indexing is per-sample: permuting idx changes the result
    out2 = normalize_batch(meshes, "normal", stats=stats,
                           idx=np.roll(idx, 1))
    assert np.abs(out - out2).max() > 1e-6


def test_plane_girth_circle():
    """Plane/edge-intersection girth of a circular ring ~= 2*pi*r
    (reference utils_SH.py:100-142 capability)."""
    from semantichuman_tpu.data.measure_np import plane_girth
    r, n_edges = 0.7, 48
    ang = np.linspace(0, 2 * np.pi, n_edges, endpoint=False)
    rng = np.random.default_rng(0)
    # vertical edges straddling the z=0.3 plane, shuffled order
    lo = np.stack([r * np.cos(ang), r * np.sin(ang),
                   0.3 - rng.uniform(0.05, 0.2, n_edges)], axis=1)
    hi = np.stack([r * np.cos(ang), r * np.sin(ang),
                   0.3 + rng.uniform(0.05, 0.2, n_edges)], axis=1)
    edges = np.stack([lo, hi], axis=1)
    edges = edges[rng.permutation(n_edges)]
    girth, pts, order = plane_girth([0, 0, 0.3], [0, 0, 1.0], edges)
    assert girth == pytest.approx(2 * np.pi * r, rel=5e-3)
    np.testing.assert_allclose(pts[:, 2], 0.3, atol=1e-9)
    assert sorted(order.tolist()) == list(range(n_edges))


# --- hostile real-asset loading (VERDICT r2 item 3) ---------------------------

@pytest.fixture()
def asset_dir(tmp_path, small_human):
    """A well-formed on-disk asset bundle (the make_synthetic layout)."""
    from semantichuman_tpu.topology.adjacency import unique_edges
    from semantichuman_tpu.topology.obj_io import save_obj

    sh = small_human
    adir = tmp_path / "asset"
    adir.mkdir()
    np.save(adir / "J_regressor.npy", sh.J_regressor)
    np.save(adir / "vert_part_index_dict.npy",
            np.asarray(sh.part_dict, dtype=object))
    np.save(adir / "factor_list.npy",
            np.asarray(sh.girth_factors, dtype=object))
    np.save(adir / "edge_point_index_list.npy",
            np.asarray(sh.girth_edges, dtype=object))
    np.save(adir / "edge_verts_index.npy",
            unique_edges(sh.template_faces))
    tpl = tmp_path / "template.obj"
    save_obj(str(tpl), sh.template_verts, sh.template_faces)
    return str(adir), str(tpl)


def _load(asset_dir_tpl):
    from semantichuman_tpu.data.assets import BodyAssets
    return BodyAssets.load(*asset_dir_tpl)


def test_assets_load_clean(asset_dir, small_human):
    a = _load(asset_dir)
    assert a.j_regressor.shape == small_human.J_regressor.shape
    assert a.j_regressor.dtype == np.float32
    assert len(a.part_dict) == len(small_human.part_dict)
    assert len(a.girth_edges) == len(small_human.girth_edges)
    assert a.edge_verts.shape[1] == 2


def test_assets_sparse_object_j_regressor(asset_dir, small_human):
    """The real SMPL J_regressor ships as a scipy sparse matrix pickled
    inside a 0-d object array — np.asarray on it yields a useless 0-d
    object scalar; the loader must densify it."""
    import scipy.sparse as sp
    adir, tpl = asset_dir
    wrapped = np.empty((), dtype=object)
    wrapped[()] = sp.csc_matrix(small_human.J_regressor)
    np.save(os.path.join(adir, "J_regressor.npy"), wrapped,
            allow_pickle=True)
    a = _load((adir, tpl))
    np.testing.assert_allclose(a.j_regressor,
                               small_human.J_regressor.astype(np.float32),
                               atol=1e-6)


def test_assets_bare_sparse_j_regressor(asset_dir, small_human):
    """A directly-pickled sparse matrix (np.save wraps it itself)."""
    import scipy.sparse as sp
    adir, tpl = asset_dir
    np.save(os.path.join(adir, "J_regressor.npy"),
            sp.csr_matrix(small_human.J_regressor), allow_pickle=True)
    a = _load((adir, tpl))
    np.testing.assert_allclose(a.j_regressor,
                               small_human.J_regressor.astype(np.float32),
                               atol=1e-6)


def test_assets_wrong_shape_j_regressor(asset_dir, small_human):
    adir, tpl = asset_dir
    np.save(os.path.join(adir, "J_regressor.npy"),
            small_human.J_regressor[:, :-3])
    with pytest.raises(ValueError, match="J_regressor.npy"):
        _load((adir, tpl))


def test_assets_out_of_range_part_index(asset_dir, small_human):
    adir, tpl = asset_dir
    bad = dict(small_human.part_dict)
    first = next(iter(bad))
    bad[first] = np.append(np.asarray(bad[first]),
                           len(small_human.template_verts) + 5)
    np.save(os.path.join(adir, "vert_part_index_dict.npy"),
            np.asarray(bad, dtype=object))
    with pytest.raises(ValueError, match="outside"):
        _load((adir, tpl))


def test_assets_nested_list_girth_tables(asset_dir, small_human):
    """Girth tables saved as plain nested Python lists (not object arrays
    of ndarrays) must load identically."""
    adir, tpl = asset_dir
    np.save(os.path.join(adir, "factor_list.npy"),
            np.asarray([list(map(list, np.asarray(f, dtype=float)))
                        for f in small_human.girth_factors], dtype=object),
            allow_pickle=True)
    a = _load((adir, tpl))
    for got, want in zip(a.girth_factors, small_human.girth_factors):
        np.testing.assert_allclose(np.asarray(got, dtype=np.float64),
                                   np.asarray(want, dtype=np.float64))


def test_assets_mismatched_girth_tables(asset_dir, small_human):
    adir, tpl = asset_dir
    np.save(os.path.join(adir, "factor_list.npy"),
            np.asarray(small_human.girth_factors[:-2], dtype=object))
    with pytest.raises(ValueError, match="girth tables"):
        _load((adir, tpl))
