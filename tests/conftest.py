"""Test harness: force an 8-device virtual CPU mesh so every multi-chip code
path (sharding, collectives) is exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from semantichuman_tpu.data.synthetic import SyntheticHuman, icosphere  # noqa: E402
from semantichuman_tpu.topology import compile_topology  # noqa: E402


@pytest.fixture(scope="session")
def ico():
    return icosphere(subdiv=3)  # 642 verts, 1280 faces


@pytest.fixture(scope="session")
def small_human():
    """A small synthetic human (fast): ~1.2k vertices."""
    return SyntheticHuman(n_theta=24, n_phi=50)


@pytest.fixture(scope="session")
def small_hierarchy(small_human, tmp_path_factory):
    cache = tmp_path_factory.mktemp("topo") / "hier.npz"
    return compile_topology(
        small_human.template_verts, small_human.template_faces,
        ds_factors=(2, 2, 2, 2), step_sizes=(2, 2, 1, 1, 1),
        dilation=(2, 2, 1, 1, 1), reference_vertex=0,
        cache_path=str(cache))
