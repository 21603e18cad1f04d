"""DFAUST first-contact drill, exercised in CI on HOSTILE-format synthetic
fixtures (VERDICT r3 item 8): the drill's asset -> topology -> import
stages must run end-to-end against the real artifacts' worst on-disk
formats — a scipy-sparse J_regressor pickled inside a 0-d object array and
ragged object-dtype girth tables — so first contact with real DFAUST data
stays a data problem, not a code problem."""

import importlib.util
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sp = pytest.importorskip("scipy.sparse")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_drill():
    spec = importlib.util.spec_from_file_location(
        "dfaust_drill", os.path.join(REPO, "tools", "dfaust_drill.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def hostile_bundle(tmp_path, small_human):
    """Asset dir + template + reference-layout .pth.tar, every array in its
    hostile real-world on-disk format."""
    from semantichuman_tpu.topology.adjacency import unique_edges
    from semantichuman_tpu.topology.obj_io import save_obj

    sh = small_human
    adir = tmp_path / "asset"
    adir.mkdir()
    # sparse matrix pickled INSIDE a 0-d object array (SMPL distribution)
    wrapped = np.empty((), dtype=object)
    wrapped[()] = sp.csc_matrix(sh.J_regressor)
    np.save(adir / "J_regressor.npy", wrapped, allow_pickle=True)
    np.save(adir / "vert_part_index_dict.npy",
            np.asarray(sh.part_dict, dtype=object))
    # ragged object-dtype girth tables (per-part lists of differing length)
    np.save(adir / "factor_list.npy",
            np.asarray([[float(x) for x in np.ravel(f)]
                        for f in sh.girth_factors], dtype=object))
    np.save(adir / "edge_point_index_list.npy",
            np.asarray([np.asarray(e) for e in sh.girth_edges],
                       dtype=object))
    np.save(adir / "edge_verts_index.npy", unique_edges(sh.template_faces))
    tpl = tmp_path / "template.obj"
    save_obj(str(tpl), sh.template_verts, sh.template_faces)

    # config with the small filters (the drill compiles topology with the
    # config's own knobs, exactly as the Trainer does)
    cfg_path = tmp_path / "drill_model.yaml"
    cfg_path.write_text(
        "model:\n"
        "  filter_sizes_enc: [[3, 8, 8, 16, 16], [[], [], [], [], []]]\n"
        "  filter_sizes_dec: [[16, 16, 8, 8, 8], [[], [], [], [], 3]]\n"
        "  part_shape_latent_size: 8\n"
        "  part_kps_latent_size: 8\n"
        "  use_pallas: false\n")

    # a reference-layout checkpoint whose tensor shapes match the hierarchy
    # the drill will compile (same template, same knobs, same ref vertex)
    from benchmarks.torch_baseline import build_torch_model, \
        reference_state_dict
    from semantichuman_tpu.config import Config
    from semantichuman_tpu.constants import KPS_INDEX_LIST
    from semantichuman_tpu.topology import compile_topology

    # compile from the LOADED bundle, exactly as the drill will: the OBJ
    # roundtrip truncates vertex coordinates (~5e-7), which changes QEM tie
    # decisions — a hierarchy compiled from the in-memory template would
    # disagree with the drill's in coarse part sizes
    from semantichuman_tpu.data.assets import BodyAssets
    a = BodyAssets.load(str(adir), str(tpl))
    cfg = Config.from_yaml(str(cfg_path))
    hier = compile_topology(
        a.template_verts, a.template_faces,
        ds_factors=cfg.model.ds_factors, step_sizes=cfg.model.step_sizes,
        dilation=cfg.model.dilation,
        reference_vertex=min(414, len(a.template_verts) - 1),
        cache_path=str(tmp_path / "ckpt_topo.npz"))
    coarse = hier.downsample_part_indices(a.part_dict)
    torch.manual_seed(7)
    tmodel = build_torch_model(hier, coarse, KPS_INDEX_LIST,
                               enc_filters=[3, 8, 8, 16, 16],
                               dec_filters=[16, 16, 8, 8, 8])
    ckpt = tmp_path / "checkpoint42.pth.tar"
    torch.save({"epoch": 42,
                "autoencoder_state_dict": reference_state_dict(tmodel),
                "optimizer_state_dict": {},
                "scheduler_state_dict": {}}, str(ckpt))
    return str(adir), str(tpl), str(ckpt), str(cfg_path)


def test_drill_stages_on_hostile_assets(hostile_bundle, tmp_path, capsys):
    adir, tpl, ckpt, cfg_path = hostile_bundle
    drill = _load_drill()
    rc = drill.main(["--asset_dir", adir, "--template", tpl,
                     "--checkpoint", ckpt, "--config", cfg_path,
                     "--workdir", str(tmp_path / "drill_wd")])
    out = capsys.readouterr().out
    assert rc == 0, out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["drill"] == "ok"
    assert set(summary["stages"]) == {"assets", "topology", "import"}
    assert summary["stages"]["import"].startswith("epoch=42")


def test_drill_names_failing_stage(hostile_bundle, tmp_path, capsys):
    """A corrupt checkpoint must fail AT the import stage, by name — the
    drill's whole point is pinpointing which contract real data breaks."""
    adir, tpl, _ckpt, cfg_path = hostile_bundle
    bad = tmp_path / "bad.pth.tar"
    torch.save({"epoch": 1, "autoencoder_state_dict": {
        "conv.0.conv.weight": torch.zeros(3, 3)}}, str(bad))
    drill = _load_drill()
    rc = drill.main(["--asset_dir", adir, "--template", tpl,
                     "--checkpoint", str(bad), "--config", cfg_path,
                     "--workdir", str(tmp_path / "drill_wd2")])
    out = capsys.readouterr().out
    assert rc == 1
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["drill"] == "failed"
    assert summary["stages"]["import"] == "FAILED"
    assert summary["stages"]["assets"] != "FAILED"
    assert summary["stages"]["topology"] != "FAILED"
