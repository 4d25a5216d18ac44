"""Test configuration: force a virtual 8-device CPU platform so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

# Hard-force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel, which
# must not be touched by unit tests (and would serialize them over one chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
