"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (the JAX-native
substitute for a fake distributed backend).
"""

import os

# XLA_FLAGS must be in the environment before backends initialise; the
# platform choice must ALSO be forced via jax.config — on this image the
# JAX_PLATFORMS env var alone is ignored by the 'axon' TPU plugin and
# tests would silently serialise onto the single tunnelled TPU chip.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference repo not mounted")
    return REFERENCE_PATH


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
