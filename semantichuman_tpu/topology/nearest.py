"""Nearest-point-on-mesh queries (replaces psbody.mesh's C++ AABB tree —
reference usage: mesh_sampling.py:53).

Two backends with identical results:
  * a first-party C++ AABB tree (native/aabb.cpp, loaded via ctypes) — the
    fast path for the one-time upsample-matrix build;
  * a chunked, fully-vectorized NumPy brute force (Ericson closest-point-on-
    triangle over all faces) — always available fallback.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    so = os.path.join(native_dir, "libaabb.so")
    if not os.path.exists(so) and os.path.exists(
            os.path.join(native_dir, "aabb.cpp")):
        # one-shot build on first use; silently fall back on failure
        import subprocess
        try:
            subprocess.run(["make", "-C", native_dir], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
    for cand in (so, os.path.join(here, "libaabb.so")):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.aabb_nearest.restype = None
                lib.aabb_nearest.argtypes = [
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,   # verts, V
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,    # faces, F
                    ctypes.POINTER(ctypes.c_double), ctypes.c_int64,   # queries, N
                    ctypes.POINTER(ctypes.c_int64),                    # out face idx
                    ctypes.POINTER(ctypes.c_double),                   # out points
                    ctypes.POINTER(ctypes.c_double),                   # out bary
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def closest_point_on_triangles(p: np.ndarray, a: np.ndarray, b: np.ndarray,
                               c: np.ndarray):
    """Closest points on triangles (a,b,c) to points p, fully broadcast.

    All inputs broadcast to a common leading shape [...]; returns
    (closest [..., 3], bary [..., 3], sqdist [...]).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = np.sum(ab * ap, axis=-1)
    d2 = np.sum(ac * ap, axis=-1)
    bp = p - b
    d3 = np.sum(ab * bp, axis=-1)
    d4 = np.sum(ac * bp, axis=-1)
    cp = p - c
    d5 = np.sum(ab * cp, axis=-1)
    d6 = np.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-300
    # interior barycentrics (used when no edge/vertex region claims the point)
    denom = va + vb + vc
    denom = np.where(np.abs(denom) < eps, 1.0, denom)
    v_in = vb / denom
    w_in = vc / denom

    t_ab = d1 / np.where(np.abs(d1 - d3) < eps, 1.0, d1 - d3)
    t_ac = d2 / np.where(np.abs(d2 - d6) < eps, 1.0, d2 - d6)
    den_bc = (d4 - d3) + (d5 - d6)
    t_bc = (d4 - d3) / np.where(np.abs(den_bc) < eps, 1.0, den_bc)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    # priority: vertex regions, then edge regions, then interior
    u = np.select(
        [in_a, in_b, in_c, on_ab, on_ac, on_bc],
        [1.0, 0.0, 0.0, 1.0 - t_ab, 1.0 - t_ac, 0.0],
        default=1.0 - v_in - w_in)
    v = np.select(
        [in_a, in_b, in_c, on_ab, on_ac, on_bc],
        [0.0, 1.0, 0.0, t_ab, 0.0, 1.0 - t_bc],
        default=v_in)
    w = 1.0 - u - v

    bary = np.stack([u, v, w], axis=-1)
    closest = u[..., None] * a + v[..., None] * b + w[..., None] * c
    diff = p - closest
    sqdist = np.sum(diff * diff, axis=-1)
    return closest, bary, sqdist


def nearest_on_mesh(verts: np.ndarray, faces: np.ndarray, queries: np.ndarray,
                    chunk: int = 128):
    """For each query point: (face index [N], closest point [N,3], bary [N,3]).

    Uses the C++ AABB tree when built, else chunked NumPy brute force.
    """
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    queries = np.ascontiguousarray(queries, dtype=np.float64)
    n = len(queries)
    if len(faces) == 0:
        raise ValueError("nearest_on_mesh: mesh has no faces "
                         "(degenerate decimation level?)")

    lib = _load_native()
    if lib is not None:
        out_face = np.empty(n, dtype=np.int64)
        out_pt = np.empty((n, 3), dtype=np.float64)
        out_bary = np.empty((n, 3), dtype=np.float64)
        lib.aabb_nearest(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            out_face.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_pt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out_bary.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out_face, out_pt, out_bary

    tri_a = verts[faces[:, 0]][None]    # [1, F, 3]
    tri_b = verts[faces[:, 1]][None]
    tri_c = verts[faces[:, 2]][None]
    out_face = np.empty(n, dtype=np.int64)
    out_pt = np.empty((n, 3), dtype=np.float64)
    out_bary = np.empty((n, 3), dtype=np.float64)
    for s in range(0, n, chunk):
        q = queries[s:s + chunk][:, None, :]     # [P, 1, 3]
        closest, bary, sqd = closest_point_on_triangles(q, tri_a, tri_b, tri_c)
        best = np.argmin(sqd, axis=1)
        rows = np.arange(len(best))
        out_face[s:s + chunk] = best
        out_pt[s:s + chunk] = closest[rows, best]
        out_bary[s:s + chunk] = bary[rows, best]
    return out_face, out_pt, out_bary
