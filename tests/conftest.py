"""Test harness: force an 8-device virtual CPU mesh so every multi-chip code
path (sharding, collectives) is exercised without TPU hardware."""

import os

# The container's sitecustomize imports jax and registers the axon TPU
# backend before any test code runs, so env vars alone are too late —
# switch platforms through jax.config (the CPU client is created lazily,
# after XLA_FLAGS below takes effect).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from semantichuman_tpu.data.synthetic import SyntheticHuman, icosphere  # noqa: E402
from semantichuman_tpu.topology import compile_topology  # noqa: E402


@pytest.fixture(scope="session")
def ico():
    return icosphere(subdiv=3)  # 642 verts, 1280 faces


@pytest.fixture(scope="session")
def small_human():
    """A small synthetic human (fast): ~600 vertices."""
    return SyntheticHuman(n_theta=16, n_phi=36)


@pytest.fixture(scope="session")
def small_hierarchy(small_human, tmp_path_factory):
    cache = tmp_path_factory.mktemp("topo") / "hier.npz"
    return compile_topology(
        small_human.template_verts, small_human.template_faces,
        ds_factors=(2, 2, 2, 2), step_sizes=(2, 2, 1, 1, 1),
        dilation=(2, 2, 1, 1, 1), reference_vertex=0,
        cache_path=str(cache))


SMALL_MODEL_OVERRIDES = {
    # slim filters keep CPU-compile time down while exercising every layer
    "filter_sizes_enc": [[3, 8, 8, 16, 16], [[], [], [], [], []]],
    "filter_sizes_dec": [[16, 16, 8, 8, 8], [[], [], [], [], 3]],
    "part_shape_latent_size": 8,
    "part_kps_latent_size": 8,
    "use_pallas": False,
}


@pytest.fixture(scope="session")
def small_cfg():
    from semantichuman_tpu.config import Config
    return Config.from_dict({"model": dict(SMALL_MODEL_OVERRIDES)})
