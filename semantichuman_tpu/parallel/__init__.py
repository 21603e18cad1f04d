"""Device-mesh / data-parallel utilities (jax.sharding over ICI)."""

from .mesh import (batch_sharding, make_mesh, replicated_sharding,  # noqa: F401
                   shard_params)
