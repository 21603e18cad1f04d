"""Adversarial stress for spiral-ordering parity vs the reference generator.

Beyond the two golden hierarchies (tools/gen_spiral_oracle.py), this probes
the cases where our insertion-ordered triangle pools could diverge from the
reference's hash-ordered Python sets (utils_spiral.py:260,328):

  * open meshes with boundary (grid patches; checkerboard diagonals give
    mixed valences 4/8) — exercises the reverse-pass + -1 padding,
  * random vertex relabelings of the same mesh — scrambles tuple hash
    values, i.e. samples many different set iteration orders,
  * the icosphere (valence-5/6 closed mesh).

Run: python tools/stress_spiral_oracle.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantichuman_tpu.data.synthetic import SyntheticHuman, icosphere  # noqa: E402
from semantichuman_tpu.topology.adjacency import (adjacency_lists,  # noqa: E402
                                                  triangle_lists)
from semantichuman_tpu.topology.spiral import generate_spirals as ours  # noqa: E402

from gen_spiral_oracle import load_reference_spiral, run_reference  # noqa: E402


class _Levels:
    def __init__(self, verts):
        self.verts = verts


def grid_patch(nx: int, ny: int, checker: bool = True):
    """Open triangulated grid with boundary; checkerboard diagonals."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(),
                      0.05 * np.sin(xs.ravel() + 2 * ys.ravel())], 1).astype(float)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = a + 1
            c = a + ny
            d = c + 1
            if checker and (i + j) % 2 == 0:
                faces += [[a, c, b], [b, c, d]]
            else:
                faces += [[a, c, d], [a, d, b]]
    return verts, np.asarray(faces, np.int32)


def relabel(verts, faces, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(verts))      # old -> new id
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(verts))
    return verts[inv], perm[np.asarray(faces, np.int64)].astype(np.int32)


def check(name, verts, faces, ref_mod, ref_vertex=0, n_steps=(2,), dil=(2,)):
    adj = [adjacency_lists(len(verts), faces)]
    trigs = [triangle_lists(len(verts), faces)]
    ref_points = [list(ref_vertex) if isinstance(ref_vertex, (list, tuple))
                  else [ref_vertex]]
    levels = _Levels([np.asarray(verts, float)])
    rt, rs, _ = run_reference(ref_mod, levels, adj, trigs, ref_points,
                              list(n_steps), list(dil))
    ot, osz, _ = ours(list(n_steps), levels.verts, adj, trigs, ref_points,
                      dilation=list(dil))
    same = (rs == osz and all(a.shape == b.shape and (a == b).all()
                              for a, b in zip(rt, ot)))
    n_diff = 0 if same else sum(int((a != b).sum()) for a, b in zip(rt, ot)
                                if a.shape == b.shape)
    print(f"{'OK  ' if same else 'DIFF'} {name}: sizes ref={rs} ours={osz}"
          + ("" if same else f"  ({n_diff} entries differ)"))
    if not same:
        for lvl, (a, b) in enumerate(zip(rt, ot)):
            if a.shape != b.shape:
                print(f"  level {lvl} shape ref{a.shape} ours{b.shape}")
                continue
            rows = np.unique(np.nonzero(a != b)[0])
            for r in rows[:3]:
                print(f"  row {r}: ref={a[r].tolist()}")
                print(f"  row {r}: our={b[r].tolist()}")
    return same


def main():
    ref_mod, sha = load_reference_spiral("/root/reference")
    print(f"reference sha1={sha}")
    ok = True

    iv, ifc = icosphere(subdiv=2)
    ok &= check("icosphere subdiv=2", iv, ifc, ref_mod, ref_vertex=7)

    gv, gf = grid_patch(14, 11, checker=True)
    ok &= check("grid 14x11 checker", gv, gf, ref_mod, ref_vertex=5)
    gv, gf = grid_patch(9, 9, checker=False)
    ok &= check("grid 9x9 uniform", gv, gf, ref_mod, ref_vertex=0)

    # 3-ring spirals stress the outer-ring induction hardest
    gv, gf = grid_patch(16, 16, checker=True)
    ok &= check("grid 16x16 3-step", gv, gf, ref_mod, ref_vertex=33,
                n_steps=(3,), dil=(1,))

    # multiple reference points: exercises the reference's accumulation quirk
    # (later Dijkstra trees overwrite earlier ones wherever they reach)
    iv, ifc = icosphere(subdiv=2)
    ok &= check("ico multi-refpoint", iv, ifc, ref_mod,
                ref_vertex=[7, 100, 3])
    gv, gf = grid_patch(12, 12, checker=True)
    ok &= check("grid multi-refpoint", gv, gf, ref_mod, ref_vertex=[0, 77])

    sh = SyntheticHuman(n_theta=12, n_phi=24)
    for seed in range(8):
        v, f = relabel(sh.template_verts, sh.template_faces, seed)
        ok &= check(f"relabel human seed={seed}", v, f, ref_mod,
                    ref_vertex=int(np.argmax(v[:, 1])))
    iv, ifc = icosphere(subdiv=2)
    for seed in range(8, 12):
        v, f = relabel(iv, ifc, seed)
        ok &= check(f"relabel ico seed={seed}", v, f, ref_mod, ref_vertex=0,
                    n_steps=(2,), dil=(1,))

    print("STRESS PARITY OK" if ok else "STRESS PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
