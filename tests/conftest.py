"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/halo-exchange logic
is validated on host-platform virtual devices (the standard JAX testing
pattern, replacing the reference's backend-switch conftest,
/root/reference/tests/conftest.py:12-23). Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms at interpreter start; the env
# var alone does not win. Re-pin to the virtual CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def small_graph():
    """The golden 4-node test graph mirroring the reference's fixture shape
    (tests/test_message_passing.py:54-80): edges into node 0 from 1,2; into
    node 1 from 0; into node 3 from 2."""
    x = np.array(
        [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], dtype=np.float32
    )
    # (sender, receiver) pairs
    edge_index = np.array(
        [[1, 2, 0, 2], [0, 0, 1, 3]], dtype=np.int32
    )
    return x, edge_index
