"""Blockwise flash attention vs. einsum oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.attention import mask_to_bias, reference_mhsa
from ishara_tpu.ops.attention_blocked import flash_mhsa_blocked

B, H, Dh = 2, 2, 16
SCALE = 0.1


def make(T, seed=0, masked=True):
    r = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(r.standard_normal((B, H, T, Dh)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(r.random((B, T)) > 0.25) if masked \
        else jnp.ones((B, T), bool)
    return q, k, v, mask_to_bias(mask)


@pytest.mark.parametrize("T,bq,bk", [(256, 64, 64), (200, 64, 32), (96, 32, 96)])
def test_forward_matches_reference(T, bq, bk):
    q, k, v, bias = make(T)
    got = flash_mhsa_blocked(q, k, v, bias, SCALE, bq, bk, True)
    want = reference_mhsa(q, k, v, bias, SCALE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_backward_matches_reference():
    T, bq, bk = 128, 32, 64
    q, k, v, bias = make(T, seed=3)

    g1 = jax.grad(lambda q, k, v: jnp.sum(
        flash_mhsa_blocked(q, k, v, bias, SCALE, bq, bk, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        reference_mhsa(q, k, v, bias, SCALE) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_nondivisible_length_padding():
    T = 100  # not a multiple of the 64-block
    q, k, v, bias = make(T, seed=5)
    got = flash_mhsa_blocked(q, k, v, bias, SCALE, 64, 64, True)
    want = reference_mhsa(q, k, v, bias, SCALE)
    assert got.shape == (B, H, T, Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
