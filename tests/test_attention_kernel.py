"""Fused attention kernel vs. einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.attention import flash_mhsa, mask_to_bias, reference_mhsa

B, H, T, Dh = 2, 4, 32, 16
SCALE = (H * Dh) ** -0.5


@pytest.fixture(scope="module")
def qkvb(rng=None):
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.standard_normal((B, H, T, Dh)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(r.random((B, T)) > 0.25)
    return q, k, v, mask_to_bias(mask)


def test_forward_matches_reference(qkvb):
    q, k, v, bias = qkvb
    got = flash_mhsa(q, k, v, bias, scale=SCALE, interpret=True)
    want = reference_mhsa(q, k, v, bias, SCALE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_reference(qkvb):
    q, k, v, bias = qkvb

    def loss_flash(q, k, v):
        return jnp.sum(flash_mhsa(q, k, v, bias, scale=SCALE, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_mhsa(q, k, v, bias, SCALE) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fully_masked_batch_is_finite():
    r = np.random.default_rng(1)
    q = k = v = jnp.asarray(r.standard_normal((1, 1, 8, 8)).astype(np.float32))
    bias = mask_to_bias(jnp.zeros((1, 8), bool))  # everything masked
    out = flash_mhsa(q, k, v, bias, scale=0.125, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
