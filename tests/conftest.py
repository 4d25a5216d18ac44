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
# The CPU cache is keyed by host CPU signature — XLA:CPU AOT artifacts are
# machine-feature specific and reloading across hosts risks SIGILL.
if _USE_TPU:
    _cache = "/tmp/ishara_jax_cache_tpu"
else:
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "_graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    _cache = f"/tmp/ishara_jax_cache_{_mod._cpu_signature()}"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
