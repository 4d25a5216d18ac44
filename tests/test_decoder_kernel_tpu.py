"""Fused whole-loop greedy decode ON THE REAL CHIP (Mosaic lowering).

Interpret-mode parity lives in test_decoder_kernel.py; this proves the
Mosaic TPU lowering of the grid-pipelined decode loop (scratch-carried
caches, masked post-EOS skipping, one-hot-matmul embedding, first-max
argmax) and token parity with the XLA while_loop path at the flagship
translation geometry (dim 208, 2 decoder layers, 8 heads).

Run: ``ISHARA_TEST_TPU=1 pytest tests/test_decoder_kernel_tpu.py``
(skipped on the CPU CI mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.decode.autoregressive import greedy_translate_cached
from ishara_tpu.models.seq2seq import ASLTranslationModel
from ishara_tpu.ops.decoder_kernel import fused_greedy_translate

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("needs the real chip", allow_module_level=True)


def test_fused_decode_on_chip_flagship_geometry():
    model = ASLTranslationModel(dropout=0.0)  # dim 208, L=2, H=8 defaults
    T = 176
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, T, 92, 3)).astype(np.float32))
    mask = jnp.ones((1, T), bool).at[0, 150:].set(False)
    variables = model.init(jax.random.key(0), x, mask,
                           jnp.zeros((1, 4), jnp.int32))

    ref, c_ref = jax.jit(
        lambda v, x, m: greedy_translate_cached(
            model, v, x, m, max_len=64, early_exit=False)
    )(variables, x, mask)
    got, c_got = jax.jit(
        lambda v, x, m: fused_greedy_translate(
            model, v, x, m, max_len=64, interpret=False)
    )(variables, x, mask)
    # token-exact is the contract (argmax ties at f32 associativity
    # tolerance are astronomically unlikely with continuous random weights)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_got),
                               rtol=1e-4, atol=1e-4)


def test_fused_beam_on_chip_flagship_geometry():
    from ishara_tpu.decode.autoregressive import beam_translate_cached
    from ishara_tpu.ops.decoder_kernel import fused_beam_translate

    model = ASLTranslationModel(dropout=0.0)
    T = 176
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, T, 92, 3)).astype(np.float32))
    mask = jnp.ones((1, T), bool).at[0, 150:].set(False)
    variables = model.init(jax.random.key(1), x, mask,
                           jnp.zeros((1, 4), jnp.int32))

    ref, c_ref, s_ref = jax.jit(
        lambda v, x, m: beam_translate_cached(
            model, v, x, m, max_len=64, beam_width=4)
    )(variables, x, mask)
    got, c_got, s_got = jax.jit(
        lambda v, x, m: fused_beam_translate(
            model, v, x, m, max_len=64, beam_width=4, interpret=False)
    )(variables, x, mask)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_got),
                               rtol=1e-3, atol=1e-3)
