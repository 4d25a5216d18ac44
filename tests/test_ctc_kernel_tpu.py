"""CTC Pallas kernel ON THE REAL CHIP: Mosaic lowering + numerics at the
flagship training geometry (B=256, T=176, C=60, U=64 — nb cell 6 contract).

Run: ``pytest tests/test_ctc_kernel_tpu.py`` in a TPU session (skipped on
the CPU CI mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.ctc import ctc_loss
from ishara_tpu.ops.ctc_kernel import ctc_loss_kernel

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("needs the real chip", allow_module_level=True)

BLANK = 59
C = 60


def test_flagship_geometry_loss_and_grad_on_chip():
    rng = np.random.default_rng(0)
    B, T, U = 256, 176, 64
    logits = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    label_lens = rng.integers(0, U + 1, size=B)
    labels = np.full((B, U), BLANK, np.int32)
    for b in range(B):
        labels[b, : label_lens[b]] = rng.integers(0, C - 1, label_lens[b])
    labels = jnp.asarray(labels)

    l_s, g_s = jax.jit(jax.value_and_grad(
        lambda lg: ctc_loss(lg, labels, blank_id=BLANK, impl="scan")))(logits)
    l_k, g_k = jax.jit(jax.value_and_grad(
        lambda lg: ctc_loss_kernel(lg, labels, blank_id=BLANK)))(logits)

    np.testing.assert_allclose(float(l_k), float(l_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_s),
                               rtol=1e-3, atol=1e-4)
