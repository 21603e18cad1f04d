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
    # per level / transition: ops/banding.py BandSpec, or None -> the
    # gather/one-hot dispatch
    bands: tuple = ()
    pool_bands: tuple = ()
    unpool_bands: tuple = ()

    @property
    def n_levels(self) -> int:
        return len(self.sizes)

    def band_for(self, level: int):
        return self.bands[level] if level < len(self.bands) else None

    def pool_band_for(self, level: int):
        return (self.pool_bands[level]
                if level < len(self.pool_bands) else None)

    def unpool_band_for(self, level: int):
        return (self.unpool_bands[level]
                if level < len(self.unpool_bands) else None)


# conv banding only pays where the full one-hot was rejected: the fine
# levels (V1 > the upper bound of ops/spiral_conv._onehot_ok)
BAND_MIN_V1 = 2049
# sampling tables band at every level large enough to matter (same floor
# as the one-hot sampling gate)
BAND_MIN_ROWS = 512


def device_tables(hier: MeshHierarchy, banded: bool = False) -> DeviceTables:
    bands = pool_bands = unpool_bands = ()
    if banded:
        import numpy as np

        from ..ops import banding as bd
        bands = tuple(
            bd.pick_band_spec(np.asarray(s)) if s.shape[0] >= BAND_MIN_V1
            else None
            for s in hier.spirals)
        # sampling sources live one level over, so the zero dummy row
        # index is passed explicitly
        # both sampling gates key on the FINE row count, matching the
        # calibration of the one-hot gate (_ONEHOT_MIN_ROWS checks the
        # input's fine rows for pool and the output's for unpool)
        pool_bands = tuple(
            bd.pick_band_spec(np.asarray(p)[:, None],
                              presets=bd.POOL_BAND_PRESETS,
                              dummy=hier.sizes[l])
            if hier.sizes[l] + 1 >= BAND_MIN_ROWS else None
            for l, p in enumerate(hier.pool_idx))
        unpool_bands = tuple(
            bd.pick_band_spec(np.asarray(u),
                              presets=bd.UNPOOL_BAND_PRESETS,
                              dummy=hier.sizes[l + 1])
            if u.shape[0] >= BAND_MIN_ROWS else None
            for l, u in enumerate(hier.unpool_idx))
    return DeviceTables(
        spirals=tuple(jnp.asarray(s, jnp.int32) for s in hier.spirals),
        pool_idx=tuple(jnp.asarray(p, jnp.int32) for p in hier.pool_idx),
        unpool_idx=tuple(jnp.asarray(u, jnp.int32) for u in hier.unpool_idx),
        unpool_w=tuple(jnp.asarray(w, jnp.float32) for w in hier.unpool_w),
        sizes=tuple(hier.sizes),
        spiral_sizes=tuple(hier.spiral_sizes),
        bands=bands,
        pool_bands=pool_bands,
        unpool_bands=unpool_bands,
    )
