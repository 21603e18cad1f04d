"""Differential-geometry kernel library (JAX, matrix-free).

TPU-native equivalents of the reference's geometry extras
(utils_distance.py): cotangent Laplace-Beltrami operator (LBO_slim
:165-243), geodesics-in-heat (distance_GIH :84-134, _grad_div :36-82),
vertex-face adjacency (VF_adjacency_matrix :15-33), mesh volume
(calc_volume :157-163).

Instead of scipy sparse matrices + a CUDA scatter_add extension, every
operator here is MATRIX-FREE: gathers + jax.ops.segment_sum (XLA-native
on TPU), with linear systems solved by conjugate gradients
(jax.scipy.sparse.linalg.cg) so the whole pipeline stays jit-compiled on
device — no host round trips, no sparse factorizations.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# --- primitives ----------------------------------------------------------------

def face_areas_normals(verts: jnp.ndarray, faces: jnp.ndarray):
    """verts [V,3], faces [F,3] -> (areas [F], unit normals [F,3])."""
    a = jnp.take(verts, faces[:, 0], axis=0)
    b = jnp.take(verts, faces[:, 1], axis=0)
    c = jnp.take(verts, faces[:, 2], axis=0)
    n = jnp.cross(b - a, c - a)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return 0.5 * nn[:, 0], n / jnp.maximum(nn, 1e-30)


def cotan_weights(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Per-face cotangents [F, 3]: entry k is cot of the angle at vertex k,
    the weight of the OPPOSITE edge (the classic cotan-Laplacian stencil)."""
    v0 = jnp.take(verts, faces[:, 0], axis=0)
    v1 = jnp.take(verts, faces[:, 1], axis=0)
    v2 = jnp.take(verts, faces[:, 2], axis=0)
    cots = []
    for a, b, c in ((v0, v1, v2), (v1, v2, v0), (v2, v0, v1)):
        u, w = b - a, c - a
        cross = jnp.linalg.norm(jnp.cross(u, w), axis=-1)
        cots.append(jnp.sum(u * w, axis=-1) / jnp.maximum(cross, 1e-30))
    return 0.5 * jnp.stack(cots, axis=-1)


def lumped_mass(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Barycentric lumped mass diag [V]: one third of incident face area."""
    areas, _ = face_areas_normals(verts, faces)
    n_verts = verts.shape[0]
    m = jnp.zeros(n_verts, verts.dtype)
    for k in range(3):
        m = m + jax.ops.segment_sum(areas / 3.0, faces[:, k],
                                    num_segments=n_verts)
    return m


def laplacian_apply(verts: jnp.ndarray, faces: jnp.ndarray,
                    x: jnp.ndarray) -> jnp.ndarray:
    """(L x) for the cotan Laplacian, matrix-free. x [V] or [V, C].

    L is negative-semidefinite with the convention
    (L x)_i = sum_j w_ij (x_j - x_i), w_ij = (cot α_ij + cot β_ij) / 2.
    """
    cots = cotan_weights(verts, faces)
    n_verts = verts.shape[0]
    out = jnp.zeros_like(x)
    # angle at vertex k weights the edge (k+1, k+2)
    for k in range(3):
        i = faces[:, (k + 1) % 3]
        j = faces[:, (k + 2) % 3]
        w = cots[:, k]
        diff_ij = (jnp.take(x, j, axis=0) - jnp.take(x, i, axis=0))
        contrib = w[:, None] * diff_ij if x.ndim == 2 else w * diff_ij
        out = out + jax.ops.segment_sum(contrib, i, num_segments=n_verts)
        out = out - jax.ops.segment_sum(contrib, j, num_segments=n_verts)
    return out


def vf_adjacency(faces: np.ndarray, n_verts: int):
    """Host helper: vertex->incident-face COO arrays (rows [3F] vertex ids,
    cols [3F] face ids) — the reference's VF_adjacency_matrix contract."""
    faces = np.asarray(faces)
    rows = faces.reshape(-1)
    cols = np.repeat(np.arange(len(faces)), 3)
    return rows.astype(np.int32), cols.astype(np.int32)


def mesh_volume(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Signed enclosed volume via the divergence theorem."""
    a = jnp.take(verts, faces[:, 0], axis=0)
    b = jnp.take(verts, faces[:, 1], axis=0)
    c = jnp.take(verts, faces[:, 2], axis=0)
    return jnp.sum(jnp.einsum("fd,fd->f", a, jnp.cross(b, c))) / 6.0


# --- geodesics in heat (Crane et al.) -------------------------------------------

@partial(jax.jit, static_argnames=("cg_iters",))
def geodesics_in_heat(verts: jnp.ndarray, faces: jnp.ndarray,
                      source_onehot: jnp.ndarray, t_factor: float = 1.0,
                      cg_iters: int = 200) -> jnp.ndarray:
    """Geodesic distance field from source vertices (heat method).

    verts [V,3], faces [F,3] int32, source_onehot [V] (1.0 at sources).
    Three steps, each matrix-free on device:
      1. heat diffusion     (M - t L) u = δ        — CG
      2. normalized gradient X = -∇u / |∇u|        — per face
      3. Poisson recovery    L φ = ∇·X             — CG
    t = t_factor * mean_edge_length².
    """
    verts = verts.astype(jnp.float32)
    n_verts = verts.shape[0]

    edges = jnp.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    elen = jnp.linalg.norm(jnp.take(verts, edges[:, 0], axis=0)
                           - jnp.take(verts, edges[:, 1], axis=0), axis=-1)
    t = t_factor * jnp.mean(elen) ** 2

    mass = lumped_mass(verts, faces)

    def heat_op(u):
        return mass * u - t * laplacian_apply(verts, faces, u)

    u, _ = jax.scipy.sparse.linalg.cg(heat_op, source_onehot * mass,
                                      maxiter=cg_iters, tol=1e-8)

    # face gradient of u: ∇u = (1/2A) Σ_k u_k (n × e_k), e_k opposite edge
    areas, normals = face_areas_normals(verts, faces)
    grad = jnp.zeros((faces.shape[0], 3), verts.dtype)
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        e = (jnp.take(verts, faces[:, j], axis=0)
             - jnp.take(verts, faces[:, i], axis=0))
        uk = jnp.take(u, faces[:, k])
        grad = grad + uk[:, None] * jnp.cross(normals, e)
    grad = grad / jnp.maximum(2.0 * areas[:, None], 1e-30)
    # far from the source u underflows in fp32 and |grad| collapses into
    # subnormals — normalizing there manufactures huge junk vectors, so the
    # field is zeroed wherever the gradient signal is numerically dead
    gn = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    x_field = jnp.where(gn > 1e-12, -grad / jnp.maximum(gn, 1e-12), 0.0)

    # integrated divergence at vertices
    cots = cotan_weights(verts, faces)
    div = jnp.zeros(n_verts, verts.dtype)
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        vi = jnp.take(verts, faces[:, i], axis=0)
        vj = jnp.take(verts, faces[:, j], axis=0)
        # at vertex i: cot at k weights edge (i -> j)
        dots_ij = jnp.sum(x_field * (vj - vi), axis=-1) * cots[:, k]
        div = div + jax.ops.segment_sum(dots_ij, faces[:, i],
                                        num_segments=n_verts)
        div = div - jax.ops.segment_sum(dots_ij, faces[:, j],
                                        num_segments=n_verts)

    # L is singular (constants); project the nullspace out of the RHS and
    # regularize with a mass-scaled shift so CG stays bounded on skinny
    # triangulations (a bare 1e-8 shift diverges on high-aspect meshes)
    div = div - jnp.mean(div)
    shift = 1e-6 * jnp.mean(mass)

    def lap_op(phi):
        return -laplacian_apply(verts, faces, phi) + shift * phi

    phi, _ = jax.scipy.sparse.linalg.cg(lap_op, -div, maxiter=cg_iters,
                                        tol=1e-8)
    phi = phi - jnp.mean(phi)
    phi = phi - jnp.sum(phi * source_onehot) / jnp.maximum(
        jnp.sum(source_onehot), 1.0)
    return jnp.abs(phi)


# --- spectral tools --------------------------------------------------------------

def laplacian_dense(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Dense [V, V] cotan Laplacian (for spectral analysis on small/coarse
    meshes; the per-step training path never materializes this)."""
    n = verts.shape[0]
    eye = jnp.eye(n, dtype=verts.dtype)
    return jax.vmap(lambda e: laplacian_apply(verts, faces, e),
                    in_axes=1, out_axes=1)(eye)


def spectral_basis(verts: jnp.ndarray, faces: jnp.ndarray, k: int):
    """First k eigenpairs of the mass-normalized Laplace-Beltrami operator
    (ascending eigenvalues; evecs are M-orthonormal).  Replaces the
    reference's dead sparse-backward Eigendecomposition
    (utils_distance.py:285-363, hardcoded .mat path) with a live,
    differentiable-by-XLA dense eigh on the coarse mesh."""
    mass = lumped_mass(verts, faces)
    inv_sqrt_m = 1.0 / jnp.sqrt(jnp.maximum(mass, 1e-30))
    L = laplacian_dense(verts, faces)
    # symmetric form: -M^{-1/2} L M^{-1/2} (PSD)
    A = -(inv_sqrt_m[:, None] * L * inv_sqrt_m[None, :])
    A = 0.5 * (A + A.T)
    w, u = jnp.linalg.eigh(A)
    evecs = inv_sqrt_m[:, None] * u[:, :k]
    return w[:k], evecs


def biharmonic_distance(verts: jnp.ndarray, faces: jnp.ndarray,
                        k: int = 64, eps: float = 1e-8) -> jnp.ndarray:
    """[V, V] biharmonic distance matrix (Lipman et al.):
    d(i, j)^2 = sum_k (phi_k(i) - phi_k(j))^2 / lambda_k^2 over nonzero
    eigenpairs (reference capability: utils_distance.py:138-155
    distance_BH, dead in its main path)."""
    w, phi = spectral_basis(verts, faces, k)
    w, phi = w[1:], phi[:, 1:]                      # drop the constant mode
    g = phi / jnp.maximum(w[None, :], eps)          # [V, k-1]
    sq = jnp.sum(g * g, axis=1)
    d2 = sq[:, None] - 2.0 * (g @ g.T) + sq[None, :]
    return jnp.sqrt(jnp.maximum(d2, 0.0))
