"""Model factory: config + compiled topology (+ part assets) -> model.

The single shared init path the reference lacked (its main.py and
utils_SH.py:225-410 duplicate the whole precompute)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..constants import KPS_INDEX_LIST
from ..topology.compiler import MeshHierarchy
from .part_ae import PartAE
from .spiral_ae import SpiralAE
from .tables import device_tables


def build_model(cfg: Config, hier: MeshHierarchy, part_dict: dict | None = None):
    """Returns a model object with .init/.encode/.decode/__call__."""
    m = cfg.model
    tables = device_tables(hier, banded=m.banded_conv)
    dtype = jnp.bfloat16 if m.trunk_dtype == "bfloat16" else None
    conv_fn = _select_conv(m)
    if m.model_type == "multiz+partkps":
        if part_dict is None:
            raise ValueError("multiz+partkps needs a part dict")
        coarse_parts = hier.downsample_part_indices(part_dict)
        return PartAE(tables, coarse_parts, KPS_INDEX_LIST,
                      m.filter_sizes_enc, m.filter_sizes_dec,
                      latent_size=m.part_shape_latent_size,
                      part_kps_latent_size=m.part_kps_latent_size,
                      compute_dtype=dtype, conv_fn=conv_fn)
    if m.model_type == "neural3DMM":
        return SpiralAE(tables, m.filter_sizes_enc, m.filter_sizes_dec,
                        latent_size=m.nz, vae=m.vae,
                        compute_dtype=dtype, conv_fn=conv_fn)
    raise ValueError(f"unknown model_type {m.model_type!r}")


def _select_conv(model_cfg):
    from ..ops.spiral_conv import spiral_conv
    if not model_cfg.use_pallas:
        return spiral_conv
    try:
        import jax
        if jax.default_backend() not in ("tpu", "axon"):
            return spiral_conv
        from ..ops.pallas.spiral_conv_pallas import spiral_conv_auto
        return spiral_conv_auto
    except Exception:
        return spiral_conv
