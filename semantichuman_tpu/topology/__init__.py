"""Host-side topology compiler.

Runs once per mesh topology (NumPy + optional C++ AABB helper), producing the
frozen integer/float tables that the jitted device code consumes:

  * QEM (QSLIM) mesh hierarchy: per-level vertices/faces + downsample
    selections + barycentric upsample gathers (reference: mesh_sampling.py).
  * Spiral orderings per level (reference: utils_spiral.py).
  * Part-index remapping onto the coarsest level (reference: main.py:118-126).

The single artifact type is `compiler.MeshHierarchy`, cached as .npz.
"""

from .compiler import MeshHierarchy, compile_topology  # noqa: F401
