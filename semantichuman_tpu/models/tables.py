"""Device-resident topology tables, derived once from a MeshHierarchy."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..topology.compiler import MeshHierarchy


@dataclass(frozen=True)
class DeviceTables:
    """Static (trace-time constant) arrays the model closes over."""
    spirals: tuple        # per level [V_l+1, S_l] int32, dummy-resolved
    pool_idx: tuple       # per transition [V_{l+1}+1] int32
    unpool_idx: tuple     # per transition [V_l+1, 3] int32
    unpool_w: tuple       # per transition [V_l+1, 3] f32
    sizes: tuple          # V_l
    spiral_sizes: tuple   # S_l
    # per level: ops/banding.py BandSpec, or None -> gather/one-hot dispatch
    bands: tuple = ()

    @property
    def n_levels(self) -> int:
        return len(self.sizes)

    def band_for(self, level: int):
        return self.bands[level] if level < len(self.bands) else None


# banding only pays where the full one-hot was rejected: the fine levels
# (V1 > ONE_HOT_MAX_V1, matching ops/spiral_conv._onehot_ok's upper bound)
BAND_MIN_V1 = 2049


def device_tables(hier: MeshHierarchy, banded: bool = False) -> DeviceTables:
    bands = ()
    if banded:
        import numpy as np

        from ..ops.banding import pick_band_spec
        bands = tuple(
            pick_band_spec(np.asarray(s)) if s.shape[0] >= BAND_MIN_V1
            else None
            for s in hier.spirals)
    return DeviceTables(
        spirals=tuple(jnp.asarray(s, jnp.int32) for s in hier.spirals),
        pool_idx=tuple(jnp.asarray(p, jnp.int32) for p in hier.pool_idx),
        unpool_idx=tuple(jnp.asarray(u, jnp.int32) for u in hier.unpool_idx),
        unpool_w=tuple(jnp.asarray(w, jnp.float32) for w in hier.unpool_w),
        sizes=tuple(hier.sizes),
        spiral_sizes=tuple(hier.spiral_sizes),
        bands=bands,
    )
