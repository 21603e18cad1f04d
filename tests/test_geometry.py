"""Geometry kernel library tests (ops/geometry.py) on analytic meshes."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantichuman_tpu.data.synthetic import icosphere
from semantichuman_tpu.ops import geometry as G


@pytest.fixture(scope="module")
def sphere():
    v, f = icosphere(subdiv=3)  # unit sphere, 642 verts
    return jnp.asarray(v, jnp.float32), jnp.asarray(f.astype(np.int32))


def test_face_areas_sum_to_sphere_area(sphere):
    v, f = sphere
    areas, normals = G.face_areas_normals(v, f)
    # icosphere subdiv-3 area slightly under 4*pi
    assert float(jnp.sum(areas)) == pytest.approx(4 * np.pi, rel=0.02)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(normals), axis=1),
                               1.0, atol=1e-5)


def test_mesh_volume_of_unit_sphere(sphere):
    v, f = sphere
    assert float(G.mesh_volume(v, f)) == pytest.approx(4 / 3 * np.pi,
                                                       rel=0.03)


def test_laplacian_annihilates_constants(sphere):
    v, f = sphere
    ones = jnp.ones(v.shape[0])
    np.testing.assert_allclose(np.asarray(G.laplacian_apply(v, f, ones)),
                               0.0, atol=1e-4)


def test_laplacian_symmetric(sphere):
    v, f = sphere
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(v.shape[0]), jnp.float32)
    y = jnp.asarray(rng.standard_normal(v.shape[0]), jnp.float32)
    lhs = float(jnp.sum(y * G.laplacian_apply(v, f, x)))
    rhs = float(jnp.sum(x * G.laplacian_apply(v, f, y)))
    assert lhs == pytest.approx(rhs, rel=1e-3, abs=1e-3)


def test_laplacian_negative_semidefinite(sphere):
    v, f = sphere
    rng = np.random.default_rng(1)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal(v.shape[0]), jnp.float32)
        assert float(jnp.sum(x * G.laplacian_apply(v, f, x))) <= 1e-3


def test_lumped_mass_totals_area(sphere):
    v, f = sphere
    areas, _ = G.face_areas_normals(v, f)
    assert float(jnp.sum(G.lumped_mass(v, f))) == pytest.approx(
        float(jnp.sum(areas)), rel=1e-5)


def test_vf_adjacency(sphere):
    _v, f = sphere
    rows, cols = G.vf_adjacency(np.asarray(f), 642)
    assert len(rows) == len(cols) == 3 * f.shape[0]
    # every vertex of face j appears with col j
    assert set(np.asarray(f)[5]) == set(rows[cols == 5])


def test_geodesics_in_heat_matches_arc_length(sphere):
    v, f = sphere
    src = jnp.zeros(v.shape[0]).at[0].set(1.0)
    d = np.asarray(G.geodesics_in_heat(v, f, src, cg_iters=300))
    # ground truth on the unit sphere: arc length = angle to source
    cosang = np.clip(np.asarray(v) @ np.asarray(v[0]), -1.0, 1.0)
    truth = np.arccos(cosang)
    err = np.abs(d - truth)
    # heat method on a coarse icosphere: a few percent of the max distance pi
    assert err.mean() < 0.10
    assert d[0] == pytest.approx(0.0, abs=0.05)
    far = int(np.argmax(truth))
    assert d[far] == pytest.approx(np.pi, rel=0.12)


def test_geodesics_bounded_on_elongated_mesh():
    """Regression: fp32 gradient underflow far from the source manufactured
    ~1e9 'distances' on high-aspect meshes before the dead-signal guard."""
    from semantichuman_tpu.data.synthetic import SyntheticHuman
    sh = SyntheticHuman(n_theta=16, n_phi=40)
    v = jnp.asarray(sh.template_verts, jnp.float32)
    f = jnp.asarray(sh.template_faces.astype(np.int32))
    src = jnp.zeros(v.shape[0]).at[0].set(1.0)
    d = np.asarray(G.geodesics_in_heat(v, f, src, cg_iters=400))
    bbox_diag = float(np.linalg.norm(np.ptp(sh.template_verts, axis=0)))
    assert np.isfinite(d).all()
    # geodesics on a closed surface are bounded by a small multiple of the
    # bbox diagonal (body circumference), nothing like the 1e9 blow-up
    assert d.max() < 4 * bbox_diag


def test_spectral_basis_properties(sphere):
    v, f = sphere
    w, phi = G.spectral_basis(v, f, k=10)
    w = np.asarray(w); phi = np.asarray(phi)
    # eigenvalues ascending, first ~0 (constant mode)
    assert abs(w[0]) < 1e-4
    assert np.all(np.diff(w) > -1e-5)
    # sphere spectrum: eigenvalue l(l+1) with multiplicity 2l+1 -> next 3 ~ 2
    np.testing.assert_allclose(w[1:4], 2.0, rtol=0.05)
    # M-orthonormality
    m = np.asarray(G.lumped_mass(v, f))
    gram = phi.T @ (m[:, None] * phi)
    np.testing.assert_allclose(gram, np.eye(10), atol=5e-3)


def test_biharmonic_distance_is_metric_like(sphere):
    v, f = sphere
    d = np.asarray(G.biharmonic_distance(v, f, k=32))
    assert d.shape == (642, 642)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-3)  # fp32 x^2-2xy+y^2
    np.testing.assert_allclose(d, d.T, atol=1e-5)
    assert np.all(d >= 0)
    # monotone-ish with geodesic separation: antipode farther than neighbor
    cosang = np.clip(np.asarray(v) @ np.asarray(v[0]), -1, 1)
    near = int(np.argsort(-cosang)[1])     # nearest neighbor of vertex 0
    far = int(np.argmin(cosang))           # antipode
    assert d[0, far] > 3 * d[0, near]


def test_vertex_normals_radial_on_sphere(sphere):
    from semantichuman_tpu.ops.distance import vertex_normals
    v, f = sphere
    n = np.asarray(vertex_normals(v[None], f))[0]   # batched op [B, V, 3]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    # unit sphere: vertex normal ~ vertex direction
    cos = np.sum(n * np.asarray(v), axis=1)
    assert cos.min() > 0.99
