"""Report block-banding viability for a compiled topology.

For each spiral / pool / unpool table: the preset pick_band_spec would
adopt, its out-of-band fraction, and the fixup count — the one-command
check for whether a NEW topology (e.g. real DFAUST/SMPL, whose vertex
numbering locality is unverified) keeps the banded fast paths, before
any chip time is spent.  `None` rows fall back to the gather path and
are correct either way (ops/banding.py).

  python tools/band_report.py [--cache assets/topology_synth_full_2222.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache",
                    default=os.path.join(
                        REPO, "assets", "topology_synth_full_2222.npz"),
                    help="MeshHierarchy cache (.npz)")
    args = ap.parse_args(argv)

    import numpy as np

    from semantichuman_tpu.ops import banding as bd
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    hier = MeshHierarchy.load(args.cache)

    def row(kind, lvl, spec, rows):
        rec = {"table": kind, "level": lvl, "rows": int(rows)}
        if spec is None:
            rec["band"] = None
        else:
            rec.update(band=[spec.R, spec.W],
                       oob_pct=round(100 * spec.oob_frac, 2),
                       nfix=int(len(spec.fix_pos)), nblk=spec.nblk)
        print(json.dumps(rec))

    for lvl, sp in enumerate(hier.spirals):
        sp = np.asarray(sp)
        row("spiral", lvl, bd.pick_band_spec(sp), sp.shape[0])
    for lvl, p in enumerate(hier.pool_idx):
        p = np.asarray(p)
        row("pool", lvl,
            bd.pick_band_spec(p[:, None], presets=bd.POOL_BAND_PRESETS,
                              dummy=hier.sizes[lvl]), len(p))
    for lvl, u in enumerate(hier.unpool_idx):
        u = np.asarray(u)
        row("unpool", lvl,
            bd.pick_band_spec(u, presets=bd.UNPOOL_BAND_PRESETS,
                              dummy=hier.sizes[lvl + 1]), u.shape[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
