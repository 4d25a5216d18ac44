"""Pallas CTC kernel (interpret mode) vs the lax.scan oracle: loss AND
gradient parity over the training contract (full logit length, blank-padded
labels — reference nb cell 6 semantics). On-chip lowering is gated in
tests/test_ctc_kernel_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.ops.ctc import ctc_loss
from ishara_tpu.ops.ctc_kernel import ctc_loss_kernel

BLANK = 7
C = 8


def rand_case(rng, B, T, U, repeat_heavy=False):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    label_lens = rng.integers(0, U + 1, size=B).astype(np.int32)
    labels = np.full((B, U), BLANK, np.int32)
    for b in range(B):
        alphabet = [0, 1] if repeat_heavy else list(range(C - 1))
        labels[b, : label_lens[b]] = rng.choice(alphabet, size=label_lens[b])
    return jnp.asarray(logits), jnp.asarray(labels)


@pytest.mark.parametrize("B,T,U,repeat_heavy", [
    (4, 12, 5, False),
    (4, 12, 5, True),     # repeated labels: skip transitions disallowed
    (2, 9, 4, False),     # odd T -> chunk size gcd(9,32)=1
    (8, 16, 1, False),    # includes empty-label rows (len 0 possible)
])
def test_loss_and_grad_match_scan(B, T, U, repeat_heavy):
    rng = np.random.default_rng(42 + B + T + int(repeat_heavy))
    logits, labels = rand_case(rng, B, T, U, repeat_heavy)

    scan_fn = lambda lg: ctc_loss(lg, labels, blank_id=BLANK, impl="scan")  # noqa: E731
    kern_fn = lambda lg: ctc_loss_kernel(lg, labels, blank_id=BLANK)  # noqa: E731

    l_s, g_s = jax.value_and_grad(scan_fn)(logits)
    l_k, g_k = jax.value_and_grad(kern_fn)(logits)

    np.testing.assert_allclose(float(l_k), float(l_s), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_s),
                               rtol=2e-4, atol=2e-5)


def test_per_sequence_reduction_matches():
    rng = np.random.default_rng(0)
    logits, labels = rand_case(rng, 4, 12, 5)
    l_s = ctc_loss(logits, labels, blank_id=BLANK, reduction="none",
                   impl="scan")
    l_k = ctc_loss_kernel(logits, labels, blank_id=BLANK, reduction="none")
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_s),
                               rtol=2e-5, atol=2e-5)


def test_all_blank_labels_row():
    """A row whose label is entirely blank (length 0) stays finite."""
    rng = np.random.default_rng(1)
    logits, labels = rand_case(rng, 2, 8, 3)
    labels = labels.at[0].set(BLANK)
    val, grad = jax.value_and_grad(
        lambda lg: ctc_loss_kernel(lg, labels, blank_id=BLANK))(logits)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_auto_dispatch_uses_scan_off_tpu():
    """On the CPU mesh `impl='auto'` must keep the scan path (the kernel
    would run in slow interpret mode inside every train step)."""
    rng = np.random.default_rng(2)
    logits, labels = rand_case(rng, 2, 8, 3)
    auto = ctc_loss(logits, labels, blank_id=BLANK)
    scan = ctc_loss(logits, labels, blank_id=BLANK, impl="scan")
    np.testing.assert_allclose(float(auto), float(scan), rtol=0, atol=0)
