"""Jittable device ops: spiral convolution, mesh pool/unpool, skeleton
algebra, geometry kernels.  Everything here is pure-functional JAX traced
into the train/eval step; Pallas perf kernels live in `ops.pallas`."""

from .spiral_conv import spiral_conv, spiral_gather  # noqa: F401
from .sampling import pool, unpool  # noqa: F401
