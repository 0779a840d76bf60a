"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: XLA host-count simulation).
Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; force CPU
# explicitly so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from parallel_gcn_tpu.data.graph import build_graph, random_graph  # noqa: E402


@pytest.fixture(scope="session")
def small_graph():
    """Synthetic 50-node graph: host CSR + padded device Graph (with dense Â)."""
    csr, _ = random_graph(50, avg_degree=6, seed=0)
    graph = build_graph(csr, dense=True)
    return csr, graph


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def has_dataset(name: str) -> bool:
    try:
        from parallel_gcn_tpu.data.parser import find_data_dir

        find_data_dir(name)
        return True
    except FileNotFoundError:
        return False


requires_cora = pytest.mark.skipif(
    not has_dataset("cora"), reason="cora dataset not available"
)
