"""Test configuration: force a virtual 8-device CPU platform so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

# ISHARA_TEST_TPU=1 leaves the platform alone so the TPU-only tests
# (Mosaic-PRNG kernels) run on the real chip:
#   ISHARA_TEST_TPU=1 pytest tests/test_dropout_tpu.py tests/test_attention_dropout_tpu.py
_USE_TPU = os.environ.get("ISHARA_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    # Hard-force CPU with 8 virtual devices. The environment registers the
    # axon TPU-tunnel plugin via sitecustomize and pins jax_platforms itself,
    # so the env var alone is ignored — the config must be updated
    # post-import, before any backend initialization.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: model-test compiles dominate suite wall time.
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/ishara_jax_cache_tpu" if _USE_TPU else "/tmp/ishara_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
