"""Native C++ AABB tree vs NumPy brute-force equivalence
(the framework's replacement for psbody.mesh's C++ nearest-surface query,
reference: mesh_sampling.py:53)."""

import numpy as np
import pytest

from semantichuman_tpu.topology import nearest as N
from semantichuman_tpu.data.synthetic import icosphere


@pytest.fixture(scope="module")
def mesh():
    return icosphere(subdiv=3)  # 642 verts, 1280 faces


def test_native_builds_and_matches_numpy(mesh):
    verts, faces = mesh
    lib = N._load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable; NumPy fallback covered "
                    "by topology tests")
    rng = np.random.default_rng(0)
    q = rng.standard_normal((500, 3)) * 1.3   # inside and outside the sphere

    f_n, p_n, b_n = N.nearest_on_mesh(verts, faces, q)

    saved = N._LIB
    try:
        N._LIB = None                        # force the NumPy path
        f_p, p_p, b_p = N.nearest_on_mesh(verts, faces, q)
    finally:
        N._LIB = saved

    # closest points and distances must agree to fp precision; face ids may
    # differ only on exact ties (shared edges/vertices)
    d_n = np.linalg.norm(q - p_n, axis=1)
    d_p = np.linalg.norm(q - p_p, axis=1)
    # distances and closest points must agree to fp precision; face choice is
    # free on ties (convex meshes tie constantly: every vertex-region hit is
    # shared by all incident faces), so bary is compared via reconstruction
    np.testing.assert_allclose(d_n, d_p, rtol=0, atol=1e-12)
    np.testing.assert_allclose(p_n, p_p, rtol=0, atol=1e-9)
    tri_n = verts[faces[f_n]]
    tri_p = verts[faces[f_p]]
    rec_n = np.einsum("nk,nkd->nd", b_n, tri_n)
    rec_p = np.einsum("nk,nkd->nd", b_p, tri_p)
    np.testing.assert_allclose(rec_n, rec_p, rtol=0, atol=1e-9)


def test_native_barycentric_reconstructs_point(mesh):
    verts, faces = mesh
    lib = N._load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    q = rng.standard_normal((200, 3))
    f, p, b = N.nearest_on_mesh(verts, faces, q)
    tri = verts[faces[f]]                       # [N, 3, 3]
    recon = np.einsum("nk,nkd->nd", b, tri)
    np.testing.assert_allclose(recon, p, atol=1e-12)
    assert np.all(b >= -1e-12) and np.all(b <= 1 + 1e-12)
    np.testing.assert_allclose(b.sum(1), 1.0, atol=1e-12)