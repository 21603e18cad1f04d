"""Model zoo: SpiralAE (neural3DMM baseline) and PartAE (the paper's
multiz+partkps flagship), as pure-functional JAX (params pytree + apply fns).
"""

from .factory import build_model  # noqa: F401
from .spiral_ae import SpiralAE  # noqa: F401
from .part_ae import PartAE  # noqa: F401
