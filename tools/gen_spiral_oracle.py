"""Generate spiral-table ORACLE fixtures by running the reference generator.

Runs the reference's pure-NumPy spiral enumerator (utils_spiral.py:
get_spirals via generate_spirals) on the exact hierarchy inputs our
topology compiler produces, and commits the resulting tables as golden
fixtures under tests/golden/.  tests/test_topology.py then asserts our
generator (semantichuman_tpu.topology.spiral) reproduces the oracle
index-for-index — the invariant every checkpoint import rests on.

Usage (requires a readable reference checkout):
    python tools/gen_spiral_oracle.py [--reference /root/reference]

Provenance is recorded inside the .npz (sha1 of the reference module) so a
fixture can always be traced to the generator that produced it.
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import os
import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantichuman_tpu.data.synthetic import SyntheticHuman  # noqa: E402
from semantichuman_tpu.topology.adjacency import (adjacency_lists,  # noqa: E402
                                                  triangle_lists)
from semantichuman_tpu.topology.hierarchy import build_hierarchy  # noqa: E402
from semantichuman_tpu.topology.spiral import generate_spirals as ours  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def load_reference_spiral(ref_dir: str):
    path = os.path.join(ref_dir, "utils_spiral.py")
    sha = hashlib.sha1(open(path, "rb").read()).hexdigest()
    spec = importlib.util.spec_from_file_location("ref_utils_spiral", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, sha


def hierarchy_inputs(human: SyntheticHuman, reference_vertex: int,
                     ds_factors=(2, 2, 2, 2)):
    """Everything both generators consume: per-level verts/adj/trigs/anchors."""
    levels = build_hierarchy(human.template_verts, human.template_faces,
                             ds_factors)
    n = len(levels.verts)
    ref_points = [[reference_vertex]]
    anchor = levels.verts[0][reference_vertex]
    for lvl in range(1, n):
        d = np.sum((levels.verts[lvl] - anchor[None]) ** 2, axis=1)
        ref_points.append([int(np.argmin(d))])
    adj = [adjacency_lists(len(levels.verts[lvl]), levels.faces[lvl])
           for lvl in range(n)]
    trigs = [triangle_lists(len(levels.verts[lvl]), levels.faces[lvl])
             for lvl in range(n)]
    return levels, adj, trigs, ref_points


def run_reference(ref_mod, levels, adj, trigs, ref_points,
                  step_sizes, dilation):
    meshes = [SimpleNamespace(vertices=v) for v in levels.verts]
    tables, sizes, raw = ref_mod.generate_spirals(
        list(step_sizes), meshes, adj, trigs, ref_points,
        dilation=list(dilation), meshpackage="trimesh")
    # reference tables are float [1, V+1, S]; normalize to int32 [V+1, S]
    return [t[0].astype(np.int32) for t in tables], sizes, raw


def compare(name, ref_tables, our_tables):
    ok = True
    for lvl, (rt, ot) in enumerate(zip(ref_tables, our_tables)):
        if rt.shape != ot.shape:
            print(f"[{name}] level {lvl}: SHAPE mismatch ref{rt.shape} ours{ot.shape}")
            ok = False
            continue
        diff = rt != ot
        if diff.any():
            rows = np.unique(np.nonzero(diff)[0])
            print(f"[{name}] level {lvl}: {diff.sum()} differing entries "
                  f"in {len(rows)}/{rt.shape[0]} rows; first rows {rows[:8]}")
            r = rows[0]
            print(f"    ref[{r}] = {rt[r].tolist()}")
            print(f"    our[{r}] = {ot[r].tolist()}")
            ok = False
        else:
            print(f"[{name}] level {lvl}: identical {rt.shape}")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--write", action="store_true",
                    help="write tests/golden/spiral_oracle_*.npz fixtures")
    args = ap.parse_args(argv)

    ref_mod, sha = load_reference_spiral(args.reference)
    print(f"reference utils_spiral.py sha1={sha}")

    cases = {
        # mirrors tests/conftest.py small_hierarchy
        "small": (SyntheticHuman(n_theta=16, n_phi=36), 0),
        # full SMPL-scale synthetic template (bench/entry topology)
        "full": (SyntheticHuman(), 414),
    }
    step_sizes = (2, 2, 1, 1, 1)
    dilation = (2, 2, 1, 1, 1)

    all_ok = True
    for name, (human, ref_vertex) in cases.items():
        print(f"=== {name}: V0={len(human.template_verts)} ===")
        levels, adj, trigs, ref_points = hierarchy_inputs(human, ref_vertex)
        ref_tables, ref_sizes, _ = run_reference(
            ref_mod, levels, adj, trigs, ref_points, step_sizes, dilation)
        our_tables, our_sizes, _ = ours(
            list(step_sizes), levels.verts, adj, trigs, ref_points,
            dilation=list(dilation))
        print(f"  sizes ref={ref_sizes} ours={our_sizes}")
        all_ok &= compare(name, ref_tables, our_tables)

        if args.write:
            data = {"n_levels": np.array(len(ref_tables)),
                    "ref_sha1": np.frombuffer(bytes.fromhex(sha), np.uint8),
                    "reference_vertex": np.array(ref_vertex)}
            for lvl, t in enumerate(ref_tables):
                data[f"spirals_{lvl}"] = t
            out = os.path.join(GOLDEN, f"spiral_oracle_{name}.npz")
            np.savez_compressed(out, **data)
            print(f"  wrote {out}")

    print("PARITY OK" if all_ok else "PARITY FAILED")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
