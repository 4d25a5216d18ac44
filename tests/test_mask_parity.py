"""Per-layer mask-vs-crop equivalence (SURVEY §7 watch list: 'Masking
semantics parity ... test per-layer with mask-vs-crop equivalence')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.models.layers import (
    ECA,
    MultiHeadSelfAttention,
    SqueezeExcite,
    masked_global_average_pool,
)

B, T, C = 2, 16, 32
VALID = 10


@pytest.fixture(scope="module")
def x():
    r = np.random.default_rng(0)
    arr = r.standard_normal((B, T, C)).astype(np.float32)
    return jnp.asarray(arr)


@pytest.fixture(scope="module")
def mask():
    return jnp.arange(T)[None, :].repeat(B, 0) < VALID


def test_masked_gap_equals_crop(x, mask):
    got = masked_global_average_pool(x, mask)
    want = jnp.mean(x[:, :VALID], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_eca_mask_vs_crop(x, mask):
    layer = ECA()
    v = layer.init(jax.random.key(0), x)
    full = layer.apply(v, x, mask=mask)
    crop = layer.apply(v, x[:, :VALID], mask=mask[:, :VALID])
    np.testing.assert_allclose(np.asarray(full[:, :VALID]), np.asarray(crop),
                               rtol=1e-5, atol=1e-6)


def test_se_mask_vs_crop(x, mask):
    layer = SqueezeExcite(C)
    v = layer.init(jax.random.key(0), x)
    full = layer.apply(v, x, mask=mask)
    crop = layer.apply(v, x[:, :VALID], mask=mask[:, :VALID])
    np.testing.assert_allclose(np.asarray(full[:, :VALID]), np.asarray(crop),
                               rtol=1e-5, atol=1e-6)


def test_mhsa_mask_vs_crop(x, mask):
    layer = MultiHeadSelfAttention(dim=C, num_heads=4)
    v = layer.init(jax.random.key(0), x)
    full = layer.apply(v, x, mask=mask)
    crop = layer.apply(v, x[:, :VALID], mask=mask[:, :VALID])
    np.testing.assert_allclose(np.asarray(full[:, :VALID]), np.asarray(crop),
                               rtol=1e-4, atol=1e-5)


def test_mhsa_flash_mask_vs_crop(x, mask):
    """Same equivalence through the Pallas flash path (interpret on CPU)."""
    layer = MultiHeadSelfAttention(dim=C, num_heads=4, use_flash=True)
    v = layer.init(jax.random.key(0), x)
    full = layer.apply(v, x, mask=mask)
    crop = layer.apply(v, x[:, :VALID], mask=mask[:, :VALID])
    np.testing.assert_allclose(np.asarray(full[:, :VALID]), np.asarray(crop),
                               rtol=1e-4, atol=1e-5)
