"""Orbax-backed checkpointing of the train state
(replaces the reference's torch.save dicts — train_funcs.py:450-455 — and
its CPU round-trip around every save, train_funcs.py:442,457).

State layout: {"params", "opt_state", "epoch", "step"} pytree.  Also ships
an importer for reference-format torch .pth.tar checkpoints so users can
carry weights across (utils/import_torch.py does the name mapping).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(ckpt_dir: str, step: int, state: dict,
                    max_to_keep: int | None = None) -> str:
    """Save a state pytree under ckpt_dir/<step>; optionally prune all but
    the newest `max_to_keep` checkpoints."""
    base = _abspath(ckpt_dir)
    path = os.path.join(base, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if max_to_keep is not None and max_to_keep > 0:
        import shutil
        # prune by SAVE RECENCY (mtime), not step number: a finetune resume
        # restarts epoch numbering, and pruning by step would delete the
        # checkpoint just written in favor of stale high-numbered ones
        entries = [(os.path.getmtime(os.path.join(base, d)), d)
                   for d in os.listdir(base) if d.isdigit()]
        for _, old in sorted(entries)[:-max_to_keep]:
            if old != str(step):
                shutil.rmtree(os.path.join(base, old), ignore_errors=True)
    return path


def restore_checkpoint(ckpt_dir: str, step: int | None = None,
                       like: dict | None = None) -> tuple[dict, int]:
    """Restore (state, step).  step=None restores the latest."""
    base = _abspath(ckpt_dir)
    if step is None:
        steps = [int(d) for d in os.listdir(base) if d.isdigit()]
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {base}")
        step = max(steps)
    path = os.path.join(base, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct
                                  if hasattr(ocp.utils, "to_shape_dtype_struct")
                                  else _to_sds, like)
            state = ckptr.restore(path, target)
        else:
            state = ckptr.restore(path)
    return state, step


def _to_sds(x):
    x = np.asarray(x) if not hasattr(x, "shape") else x
    return jax.ShapeDtypeStruct(x.shape, x.dtype)


def latest_step(ckpt_dir: str) -> int | None:
    base = _abspath(ckpt_dir)
    if not os.path.isdir(base):
        return None
    steps = [int(d) for d in os.listdir(base) if d.isdigit()]
    return max(steps) if steps else None
