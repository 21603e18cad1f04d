"""Segmented training: fit in eval_every-epoch segments, running the full
test eval (reference test_funcs.py:61-110 metrics) after each and appending
one JSON line per segment to a curve.jsonl.

Shared by tools/convergence_run.py and tools/fast_recipe_sweep.py so the
segment protocol (seg_ends construction incl. the trailing partial segment,
the `trainer.start_epoch = seg_end + 1` bump, per-epoch timing) lives in one
place.
"""

from __future__ import annotations

import json
import time


def run_segments(trainer, n_epochs: int, eval_every: int, curve_path: str,
                 tag: str = "", stop_on_nonfinite: bool = False) -> list:
    """Train `trainer` to `n_epochs` in `eval_every`-epoch segments.

    After each segment: full test eval, one JSON line
    {"epoch", "l1", "mm", "sec_per_epoch"} appended to `curve_path`.
    Returns the records (each with an extra non-serialized "elapsed_sec" —
    wall time since this call started, measured after that segment's eval).
    With `stop_on_nonfinite`, a NaN/Inf mm aborts the remaining segments
    (a diverged variant won't recover; don't burn chip time on it).
    """
    import numpy as np

    t_start = time.time()
    start = trainer.start_epoch
    seg_ends = list(range(start - 1 + eval_every, n_epochs + 1, eval_every))
    if not seg_ends or seg_ends[-1] != n_epochs:
        # trailing partial segment: n_epochs not a multiple of eval_every
        # must still train (and evaluate) every epoch
        seg_ends.append(n_epochs)
    records = []
    for seg_end in seg_ends:
        t0 = time.time()
        trainer.fit(seg_end)
        sec = (time.time() - t0) / max(seg_end - trainer.start_epoch + 1, 1)
        trainer.start_epoch = seg_end + 1
        _, _, _, _, l1, mm = trainer.evaluate()
        rec = {"epoch": seg_end, "l1": round(float(l1), 6),
               "mm": round(float(mm), 4), "sec_per_epoch": round(sec, 2)}
        with open(curve_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        prefix = f"[{tag}] " if tag else ""
        print(f"{prefix}CURVE {json.dumps(rec)}", flush=True)
        records.append(dict(rec, elapsed_sec=round(time.time() - t_start, 1)))
        if stop_on_nonfinite and not np.isfinite(mm):
            print(f"{prefix}diverged (NaN) — aborting variant", flush=True)
            break
    return records
