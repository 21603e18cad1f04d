"""Seed plumbing between jax PRNG keys, ints, and NumPy generators."""

from __future__ import annotations

import numpy as np


def as_seed(seed) -> int:
    """Accept an int or a jax PRNGKey-like array; return a Python int seed."""
    if isinstance(seed, (int, np.integer)):
        return int(seed)
    arr = np.asarray(seed)
    if arr.dtype.kind in "ui" and arr.size >= 1:
        return int(arr.ravel()[-1])
    raise TypeError(f"cannot derive a seed from {seed!r}")
