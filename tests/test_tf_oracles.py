"""Golden tests against TensorFlow itself — the reference's actual numerical
oracles: tf.image.resize (resize_pad), tf.nn.ctc_loss (CTCLoss contract with
blank=59 and full logit length)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from ishara_tpu.data.vocab import PAD_TOKEN_IDX  # noqa: E402
from ishara_tpu.ops import ctc_loss  # noqa: E402
from ishara_tpu.preprocess import resample_or_pad  # noqa: E402


@pytest.mark.parametrize("T_in,T_out", [(300, 176), (177, 176), (64, 32)])
def test_resample_matches_tf_image_resize(rng, T_in, T_out):
    x = rng.standard_normal((T_in, 21, 3)).astype(np.float32)
    want = tf.image.resize(x, (T_out, 21)).numpy()
    got = np.asarray(resample_or_pad(jnp.asarray(x), T_in, T_out))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_matches_tf_reference_contract(rng):
    """Exactly the reference CTCLoss (nb cell 6): labels padded with the
    blank/pad token, label_length = non-pad count, logit_length = T."""
    B, T, U, C = 4, 30, 10, 60
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    label_lens = rng.integers(1, U, B).astype(np.int32)
    labels = np.full((B, U), PAD_TOKEN_IDX, np.int32)
    for b in range(B):
        labels[b, : label_lens[b]] = rng.integers(0, C - 1, label_lens[b])

    want = tf.nn.ctc_loss(
        labels=tf.constant(labels),
        logits=tf.constant(logits),
        label_length=tf.constant(label_lens),
        logit_length=tf.fill([B], T),
        blank_index=PAD_TOKEN_IDX,
        logits_time_major=False,
    ).numpy()
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              reduction="none"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_ctc_repeats_vs_tf(rng):
    B, T, U, C = 2, 20, 6, 60
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    labels = np.full((B, U), PAD_TOKEN_IDX, np.int32)
    labels[0, :5] = [3, 3, 3, 7, 7]
    labels[1, :4] = [1, 1, 2, 1]
    lens = np.array([5, 4], np.int32)
    want = tf.nn.ctc_loss(
        labels=tf.constant(labels), logits=tf.constant(logits),
        label_length=tf.constant(lens), logit_length=tf.fill([B], T),
        blank_index=PAD_TOKEN_IDX, logits_time_major=False).numpy()
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              reduction="none"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
