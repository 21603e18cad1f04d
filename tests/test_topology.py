"""Topology-compiler unit tests on synthetic meshes."""

import numpy as np
import pytest

from semantichuman_tpu.data.synthetic import SyntheticHuman, icosphere
from semantichuman_tpu.topology.adjacency import (adjacency_lists,
                                                  triangle_lists,
                                                  unique_edges,
                                                  vert_connectivity)
from semantichuman_tpu.topology.nearest import (closest_point_on_triangles,
                                                nearest_on_mesh)
from semantichuman_tpu.topology.qem import qslim_decimate, vertex_quadrics
from semantichuman_tpu.topology.spiral import dijkstra, get_spirals
from semantichuman_tpu.topology import compile_topology


def test_unique_edges_ico(ico):
    v, f = ico
    e = unique_edges(f)
    # closed manifold: E = 3F/2 (Euler)
    assert len(e) == 3 * len(f) // 2
    assert np.all(e[:, 0] < e[:, 1])


def test_vert_connectivity_symmetric(ico):
    v, f = ico
    A = vert_connectivity(len(v), f)
    assert (A != A.T).nnz == 0
    deg = np.asarray(A.sum(axis=1)).ravel()
    assert deg.min() >= 5  # icosphere valence 5 or 6


def test_vertex_quadrics_psd(ico):
    v, f = ico
    Q = vertex_quadrics(v, f)
    assert Q.shape == (len(v), 4, 4)
    # quadrics are sums of PSD rank-1 outer products
    eig = np.linalg.eigvalsh(Q)
    assert eig.min() > -1e-9


def test_qslim_halves_vertices(ico):
    v, f = ico
    new_faces, keep_idx, D = qslim_decimate(v, f, factor=0.5)
    n_target = int(np.ceil(len(v) * 0.5))
    assert len(keep_idx) <= n_target + 2
    assert new_faces.min() >= 0 and new_faces.max() < len(keep_idx)
    # D is a pure row selection
    assert D.shape == (len(keep_idx), len(v))
    assert np.all(D.sum(axis=1) == 1)
    # no degenerate faces
    assert np.all(new_faces[:, 0] != new_faces[:, 1])
    assert np.all(new_faces[:, 1] != new_faces[:, 2])
    assert np.all(new_faces[:, 2] != new_faces[:, 0])


def test_closest_point_on_triangle_regions():
    a = np.array([0.0, 0.0, 0.0])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([0.0, 1.0, 0.0])
    # interior projection
    p = np.array([0.25, 0.25, 1.0])
    cp, bary, d2 = closest_point_on_triangles(p, a, b, c)
    np.testing.assert_allclose(cp, [0.25, 0.25, 0.0], atol=1e-12)
    np.testing.assert_allclose(bary.sum(), 1.0)
    np.testing.assert_allclose(d2, 1.0)
    # vertex region
    p = np.array([-1.0, -1.0, 0.0])
    cp, bary, _ = closest_point_on_triangles(p, a, b, c)
    np.testing.assert_allclose(cp, a, atol=1e-12)
    np.testing.assert_allclose(bary, [1, 0, 0], atol=1e-12)
    # edge region
    p = np.array([0.5, -1.0, 0.0])
    cp, bary, _ = closest_point_on_triangles(p, a, b, c)
    np.testing.assert_allclose(cp, [0.5, 0, 0], atol=1e-12)
    np.testing.assert_allclose(bary, [0.5, 0.5, 0], atol=1e-12)


def test_nearest_on_mesh_identity(ico):
    v, f = ico
    face_idx, pts, bary = nearest_on_mesh(v, f, v[:17])
    np.testing.assert_allclose(pts, v[:17], atol=1e-9)
    # barycentric reconstruction matches
    tri = v[f[face_idx].astype(int)]
    rec = np.einsum("nk,nkd->nd", bary, tri)
    np.testing.assert_allclose(rec, v[:17], atol=1e-9)


def test_dijkstra_tree(ico):
    v, f = ico
    adj = adjacency_lists(len(v), f)
    prev, dist = dijkstra(v, adj, 0)
    assert dist[0] == 0 and prev[0] is None
    assert all(d is not None for d in dist)  # connected
    # prev pointers walk back to the source
    for i in [5, 100, len(v) - 1]:
        steps = 0
        while i != 0:
            i = prev[i]
            steps += 1
            assert steps < len(v)


def test_spirals_first_ring_is_neighbors(ico):
    v, f = ico
    adj = adjacency_lists(len(v), f)
    trigs = triangle_lists(len(v), f)
    sp = get_spirals(v, adj, trigs, [0], n_steps=1)
    assert len(sp) == len(v)
    for i, s in enumerate(sp):
        assert s[0] == i
        ring = [x for x in s[1:] if x != -1]
        # on a closed manifold the 1-ring spiral enumerates all neighbors once
        assert sorted(ring) == sorted(int(x) for x in adj[i])


def test_spirals_two_rings_subset(ico):
    v, f = ico
    adj = adjacency_lists(len(v), f)
    trigs = triangle_lists(len(v), f)
    sp1 = get_spirals(v, adj, trigs, [0], n_steps=1)
    sp2 = get_spirals(v, adj, trigs, [0], n_steps=2)
    for s1, s2 in zip(sp1, sp2):
        assert s2[:len(s1)] == s1          # ring-1 prefix unchanged
        assert len(s2) > len(s1)           # ring 2 added
        assert len(set(x for x in s2 if x != -1)) == len(
            [x for x in s2 if x != -1])    # no repeats


def test_spirals_deterministic(ico):
    v, f = ico
    adj = adjacency_lists(len(v), f)
    trigs = triangle_lists(len(v), f)
    a = get_spirals(v, adj, trigs, [0], n_steps=2)
    b = get_spirals(v, adj, trigs, [0], n_steps=2)
    assert a == b


def test_compile_topology_full(small_hierarchy, small_human):
    h = small_hierarchy
    assert h.n_levels == 5
    sizes = h.sizes
    for l in range(4):
        assert sizes[l + 1] <= int(np.ceil(sizes[l] / 2)) + 2
        # pool gather maps coarse+dummy -> fine+dummy
        assert h.pool_idx[l].shape == (sizes[l + 1] + 1,)
        assert h.pool_idx[l][-1] == sizes[l]
        assert h.pool_idx[l][:-1].max() < sizes[l]
        # unpool rows: weights sum to 1, dummy row -> coarse dummy
        assert h.unpool_idx[l].shape == (sizes[l] + 1, 3)
        np.testing.assert_allclose(h.unpool_w[l].sum(axis=1), 1.0, atol=1e-4)
        assert h.unpool_idx[l][-1, 0] == sizes[l + 1]
    for l in range(5):
        sp = h.spirals[l]
        assert sp.shape[0] == sizes[l] + 1
        assert sp.max() <= sizes[l]        # dummy index is explicit
        assert sp.min() >= 0
        # dummy row addresses only the dummy
        assert np.all(sp[-1] == sizes[l])
    # coarse_to_fine indexes the finest level
    assert h.coarse_to_fine.shape == (sizes[-1],)
    assert h.coarse_to_fine.max() < sizes[0]
    # part remap covers every coarse vertex exactly once
    parts = h.downsample_part_indices(small_human.part_dict)
    allidx = np.concatenate(list(parts.values()))
    assert len(allidx) == sizes[-1]
    assert len(np.unique(allidx)) == sizes[-1]


def test_hierarchy_cache_roundtrip(small_hierarchy, tmp_path):
    h = small_hierarchy
    p = tmp_path / "h.npz"
    h.save(str(p))
    from semantichuman_tpu.topology.compiler import MeshHierarchy
    h2 = MeshHierarchy.load(str(p))
    assert h2.sizes == h.sizes
    for l in range(5):
        np.testing.assert_array_equal(h2.spirals[l], h.spirals[l])
    np.testing.assert_array_equal(h2.coarse_to_fine, h.coarse_to_fine)


def test_upsample_reconstructs_template(small_hierarchy):
    """Unpooling the coarse template through U should land near the fine
    template (barycentric projection error only)."""
    h = small_hierarchy
    for l in range(4):
        coarse = h.verts[l + 1]
        fine = h.verts[l]
        idx = h.unpool_idx[l][:-1]
        w = h.unpool_w[l][:-1]
        rec = np.einsum("nk,nkd->nd", w, coarse[idx])
        err = np.linalg.norm(rec - fine, axis=1)
        # median error small relative to bbox diagonal
        diag = np.linalg.norm(fine.max(0) - fine.min(0))
        assert np.median(err) < 0.05 * diag


def test_synthetic_human_contract():
    sh = SyntheticHuman(n_theta=24, n_phi=50)
    V = len(sh.template_verts)
    assert sh.template_faces.min() >= 0
    assert sh.template_faces.max() < V
    assert sh.J_regressor.shape == (35, V)
    np.testing.assert_allclose(sh.J_regressor.sum(axis=1), 1.0)
    allp = np.concatenate(list(sh.part_dict.values()))
    assert len(allp) == V and len(np.unique(allp)) == V
    meshes = sh.sample_meshes(3, seed=1)
    assert meshes.shape == (3, V, 3)
    m = sh.measures(meshes)
    assert m.shape == (3, 32)
    assert np.all(m > 0)


def test_compile_topology_given_level_meshes(small_human):
    """Custom-topology alternate path (reference mesh_sampling.py:267-287):
    pre-decimated meshes supplied, D from nearest-vertex, U barycentric."""
    from semantichuman_tpu.topology import compile_topology
    from semantichuman_tpu.topology.hierarchy import build_hierarchy

    v, f = small_human.template_verts, small_human.template_faces
    own = build_hierarchy(v, f, (2, 2))
    meshes = [(own.verts[1], own.faces[1]), (own.verts[2], own.faces[2])]
    h = compile_topology(v, f, ds_factors=(2, 2), step_sizes=(2, 2, 1),
                         dilation=(1, 1, 1), reference_vertex=0,
                         level_meshes=meshes)
    assert h.n_levels == 3
    assert h.sizes[0] == len(v)
    assert [len(mv) for mv, _ in meshes] == h.sizes[1:]
    # D maps every coarse vertex to a valid fine vertex
    for l in range(2):
        assert h.pool_idx[l][:-1].max() < h.sizes[l]
        assert h.spirals[l].shape[0] == h.sizes[l] + 1


def test_topology_matches_golden_fixture(small_hierarchy):
    """Regression guard for the spiral/pool/unpool tables.

    The spiral ordering defines the conv weight layout (SURVEY.md §7.3):
    ANY drift silently breaks trained-checkpoint compatibility, so the
    compiled tables are pinned against a committed fixture.  If a change is
    intentional, regenerate tests/golden/small_human_topology.npz and note
    the checkpoint break in the commit message."""
    import os
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "small_human_topology.npz"))
    h = small_hierarchy
    for l in range(5):
        np.testing.assert_array_equal(h.spirals[l], golden[f"spirals_{l}"])
    for l in range(4):
        np.testing.assert_array_equal(h.pool_idx[l], golden[f"pool_{l}"])
        np.testing.assert_array_equal(h.unpool_idx[l],
                                      golden[f"unpool_idx_{l}"])
        np.testing.assert_allclose(h.unpool_w[l], golden[f"unpool_w_{l}"],
                                   atol=1e-6)


def test_spiral_matches_reference_oracle_small(small_hierarchy):
    """Index-for-index parity with the REFERENCE spiral generator.

    tests/golden/spiral_oracle_small.npz was produced by running the
    reference's own pure-NumPy enumerator (utils_spiral.py:45-417) on the
    exact hierarchy inputs compile_topology feeds our generator — see
    tools/gen_spiral_oracle.py (provenance sha1 stored in the fixture).
    This is the invariant every reference-checkpoint import rests on: the
    spiral order defines the conv weight layout."""
    import os
    oracle = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "spiral_oracle_small.npz"))
    h = small_hierarchy
    assert int(oracle["n_levels"]) == h.n_levels
    for l in range(h.n_levels):
        ref = oracle[f"spirals_{l}"]
        ours = np.where(h.spirals[l] == h.sizes[l], -1, h.spirals[l])
        np.testing.assert_array_equal(ours, ref)


def test_full_topology_matches_reference_oracle():
    """Same reference-oracle parity at PRODUCTION scale (6892-vertex SMPL
    -shaped template, filters/steps of the paper config): the cached
    topology used by bench.py/__graft_entry__ must equal the tables the
    reference generator emits on the same hierarchy."""
    import os
    root = os.path.join(os.path.dirname(__file__), "..")
    asset = np.load(os.path.join(root, "assets",
                                 "topology_synth_full_2222.npz"))
    oracle = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                  "spiral_oracle_full.npz"))
    for l in range(int(oracle["n_levels"])):
        ref = oracle[f"spirals_{l}"]
        got = asset[f"spirals_{l}"]
        dummy = got.shape[0] - 1
        np.testing.assert_array_equal(np.where(got == dummy, -1, got), ref)


@pytest.mark.slow
def test_spiral_relabeling_matches_live_reference():
    """Hash-order robustness, CI-enforced: randomly relabeling the vertices
    of a mesh scrambles Python tuple hash values — i.e. samples a different
    iteration order of the reference's hash-ordered triangle sets
    (utils_spiral.py:260,328) — and our insertion-ordered pools must still
    match the reference's own generator index-for-index.  Runs the live
    reference enumerator (skipped when /root/reference is absent); the
    broader sweep lives in tools/stress_spiral_oracle.py."""
    import os
    import sys
    if not os.path.exists("/root/reference/utils_spiral.py"):
        pytest.skip("reference tree not available")
    tools = os.path.join(os.path.dirname(__file__), "..", "tools")
    sys.path.insert(0, tools)
    try:
        from gen_spiral_oracle import load_reference_spiral, run_reference
        from stress_spiral_oracle import _Levels, relabel
    finally:
        sys.path.remove(tools)
    from semantichuman_tpu.data.synthetic import SyntheticHuman
    from semantichuman_tpu.topology.adjacency import (adjacency_lists,
                                                      triangle_lists)
    from semantichuman_tpu.topology.spiral import generate_spirals

    ref_mod, _sha = load_reference_spiral("/root/reference")
    sh = SyntheticHuman(n_theta=12, n_phi=24)
    v, f = relabel(sh.template_verts, sh.template_faces, seed=3)
    adj = [adjacency_lists(len(v), f)]
    trigs = [triangle_lists(len(v), f)]
    ref_points = [[int(np.argmax(v[:, 1]))]]
    levels = _Levels([np.asarray(v, float)])
    rt, rs, _ = run_reference(ref_mod, levels, adj, trigs, ref_points,
                              [2], [2])
    ot, osz, _ = generate_spirals([2], levels.verts, adj, trigs, ref_points,
                                  dilation=[2])
    assert rs == osz
    for a, b in zip(rt, ot):
        np.testing.assert_array_equal(a, b)


def test_spiral_invariants(small_hierarchy):
    """Structural invariants of the spiral tables: every real vertex's
    spiral starts at itself (reference convention, utils_spiral.py:140-255),
    all indices are valid or the dummy, and the dummy row is all-dummy."""
    h = small_hierarchy
    for l in range(h.n_levels):
        s = np.asarray(h.spirals[l])
        v = h.sizes[l]
        assert s.shape[0] == v + 1
        np.testing.assert_array_equal(s[:-1, 0], np.arange(v))
        assert s.min() >= 0 and s.max() <= v
        np.testing.assert_array_equal(s[-1], v)   # dummy row -> dummy


def test_reference_pickle_import(small_hierarchy, tmp_path):
    """Round trip through the reference's downsampling_matrices pickle
    format (main.py:93-116): scipy-sparse D/U + level meshes in, identical
    hierarchy out — the DFAUST checkpoint-compatibility path."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    import pickle
    from semantichuman_tpu.topology.reference_import import (
        hierarchy_from_reference_pickle)

    h = small_hierarchy
    mvf = [(h.verts[l], h.faces[l]) for l in range(h.n_levels)]
    D, U = [], []
    for l in range(h.n_levels - 1):
        vc, vf = h.sizes[l + 1], h.sizes[l]
        d = scipy_sparse.csc_matrix(
            (np.ones(vc), (np.arange(vc), h.pool_idx[l][:-1])),
            shape=(vc, vf))
        rows = np.repeat(np.arange(vf), 3)
        cols = h.unpool_idx[l][:-1].reshape(-1)
        vals = h.unpool_w[l][:-1].reshape(-1)
        keep = vals != 0           # sparse format drops explicit zeros
        u = scipy_sparse.csc_matrix(
            (vals[keep], (rows[keep], cols[keep])), shape=(vf, vc))
        D.append(d)
        U.append(u)
    pkl = tmp_path / "downsampling_matrices2222.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"M_verts_faces": mvf, "A": [], "D": D, "U": U,
                     "F": [h.faces[l] for l in range(1, h.n_levels)]}, f)

    got = hierarchy_from_reference_pickle(
        str(pkl), step_sizes=(2, 2, 1, 1, 1), dilation=(2, 2, 1, 1, 1),
        reference_vertex=0)
    for l in range(h.n_levels):
        np.testing.assert_array_equal(got.spirals[l], h.spirals[l])
    for l in range(h.n_levels - 1):
        np.testing.assert_array_equal(got.pool_idx[l], h.pool_idx[l])
        # unpool operator action must match (entry ORDER within a row is a
        # representation detail)
        coarse1 = np.concatenate([h.verts[l + 1], np.zeros((1, 3))])
        a = (coarse1[got.unpool_idx[l]] * got.unpool_w[l][..., None]).sum(1)
        b = (coarse1[h.unpool_idx[l]] * h.unpool_w[l][..., None]).sum(1)
        np.testing.assert_allclose(a, b, atol=1e-6)
