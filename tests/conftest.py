"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding is validated on host-platform virtual devices
(the TPU answer to "multi-node tests without a cluster", SURVEY.md §4).
Must run before the first `import jax` anywhere in the test session.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pytest plugins (jaxtyping) may import jax BEFORE this conftest runs, in
# which case jax's config already captured JAX_PLATFORMS=axon from the
# session env. config.update still works as long as no backend has been
# initialized, which is the case at collection time.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
