"""Jittable device ops: spiral convolution, mesh pool/unpool, skeleton
algebra, geometry kernels.  Everything here is pure-functional JAX traced
into the train/eval step; Pallas perf kernels live in `ops.pallas`."""

from .spiral_conv import spiral_conv, spiral_gather  # noqa: F401
from .sampling import pool, unpool  # noqa: F401
from .skeleton import edit_skl, kps2skl, skl2kps  # noqa: F401
from .distance import pairwise_dist, signed_part_volumes  # noqa: F401
from .geometry import (geodesics_in_heat, laplacian_apply,  # noqa: F401
                       lumped_mass, mesh_volume)
from .measure import measure_body, pack_girth_tables  # noqa: F401
