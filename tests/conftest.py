"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Must set the env vars before the first ``import jax`` anywhere in the test
process (pytest imports conftest first, so this is the right place).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon boot hook (sitecustomize) force-sets jax_platforms='axon,cpu',
# overriding JAX_PLATFORMS.  Backends initialise lazily, so overriding the
# config here (before any jax computation) reliably pins tests to the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "scripts"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available"
)


@pytest.fixture
def rng_np():
    return np.random.default_rng(233)
