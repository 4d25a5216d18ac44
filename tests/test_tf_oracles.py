"""Golden tests against TensorFlow itself — the reference's actual numerical
oracles: tf.image.resize (resize_pad), tf.nn.ctc_loss (CTCLoss contract with
blank=59 and full logit length)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from ishara_tpu.data import landmarks as lm  # noqa: E402
from ishara_tpu.data.vocab import PAD_TOKEN_IDX  # noqa: E402
from ishara_tpu.ops import ctc_loss  # noqa: E402
from ishara_tpu.preprocess import resample_or_pad  # noqa: E402
from ishara_tpu.preprocess.pipeline import (  # noqa: E402
    GroupStats,
    preprocess,
    thin_frames,
)


@pytest.mark.parametrize("T_in,T_out", [(300, 176), (177, 176), (64, 32)])
def test_resample_matches_tf_image_resize(rng, T_in, T_out):
    x = rng.standard_normal((T_in, 21, 3)).astype(np.float32)
    want = tf.image.resize(x, (T_out, 21)).numpy()
    got = np.asarray(resample_or_pad(jnp.asarray(x), T_in, T_out))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# TF ports of the reference's actual pre_process00 / pre_process1 tf.functions
# (nb cell 3), adapted to this repo's [T, 276] column layout (identical to the
# reference SEL_COLS ordering) — the true oracles for thin_frames and the full
# normalize/concat/flatten path.
# ---------------------------------------------------------------------------


def _tf_groups(x):
    return {
        g: tf.stack(
            [tf.gather(x, lm.GROUP_IDX[g][:, c], axis=1) for c in range(3)],
            axis=-1,
        )
        for g in lm.GROUPS
    }


def _tf_pre_process00(x):
    """Reference pre_process00: NaN->0 on hands, keep frames with hand signal
    OR at alternating positions (cumsum%2==1), boolean-mask gather."""
    groups = _tf_groups(x)
    hand = tf.concat([groups["rhand"], groups["lhand"]], axis=1)
    hand = tf.where(tf.math.is_nan(hand), 0.0, hand)
    sums = tf.reduce_sum(hand, axis=[1, 2])
    keep = tf.math.not_equal(sums, 0.0)
    alternating = tf.math.equal(tf.cumsum(tf.ones_like(sums)) % 2, 1.0)
    mask = tf.math.logical_or(keep, alternating)
    return {g: tf.boolean_mask(v, mask) for g, v in groups.items()}


def _tf_resize_pad(x, frame_len):
    if tf.shape(x)[0] < frame_len:
        return tf.pad(
            x, [[0, frame_len - tf.shape(x)[0]], [0, 0], [0, 0]],
            constant_values=float("nan"))
    return tf.image.resize(x, (frame_len, tf.shape(x)[1]))


def _tf_pre_process1(groups, stats, frame_len):
    parts = [
        (_tf_resize_pad(groups[g], frame_len) - np.asarray(stats.mean[g]))
        / np.asarray(stats.std[g])
        for g in lm.CONCAT_ORDER
    ]
    x = tf.concat(parts, axis=1)
    s = tf.shape(x)
    x = tf.reshape(x, (s[0], s[1] * s[2]))
    return tf.where(tf.math.is_nan(x), 0.0, x)


def _random_landmarks(rng, T, nan_frac=0.3):
    """Raw [T, 276] with NaN-laden rows and some all-NaN hand rows."""
    x = rng.standard_normal((T, lm.N_COLS)).astype(np.float32)
    nan_mask = rng.random((T, lm.N_COLS)) < nan_frac
    x[nan_mask] = np.nan
    hands = np.concatenate([lm.GROUP_IDX["rhand"], lm.GROUP_IDX["lhand"]])
    for t in range(T):
        if rng.random() < 0.35:  # frames with no hand signal
            x[t, hands.ravel()] = np.nan
    return x


def _random_stats(rng):
    return GroupStats(
        mean={g: rng.standard_normal((len(lm.GROUP_IDX[g]), 3)).astype(np.float32) * 0.1
              for g in lm.GROUPS},
        std={g: (np.abs(rng.standard_normal((len(lm.GROUP_IDX[g]), 3))) + 0.5).astype(np.float32)
             for g in lm.GROUPS},
    )


@pytest.mark.parametrize("T", [7, 50, 176, 300])
def test_thin_frames_matches_tf_pre_process00(rng, T):
    x = _random_landmarks(rng, T)
    want = _tf_pre_process00(tf.constant(x))

    got_x, got_len = thin_frames(jnp.asarray(x), jnp.int32(T))
    got_len = int(got_len)
    assert got_len == int(want["lip"].shape[0])
    got_groups = _tf_groups(tf.constant(np.asarray(got_x[:got_len])))
    for g in lm.GROUPS:
        np.testing.assert_allclose(
            np.asarray(got_groups[g]), want[g].numpy(), equal_nan=True,
            rtol=0, atol=0)


@pytest.mark.parametrize("T,frame_len", [(48, 96), (176, 96), (300, 176)])
def test_preprocess_matches_tf_pre_process00_plus_1(rng, T, frame_len):
    """Full inference path: thin -> per-group resize_pad -> normalize ->
    concat -> flatten -> NaN->0, vs the reference tf.functions end to end."""
    x = _random_landmarks(rng, T)
    stats = _random_stats(rng)

    want = _tf_pre_process1(
        _tf_pre_process00(tf.constant(x)), stats, frame_len).numpy()
    got = np.asarray(
        preprocess(jnp.asarray(x), jnp.int32(T), stats, frame_len, thin=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("T,frame_len", [(30, 64), (100, 64)])
def test_preprocess_no_thin_matches_tf_pre_process1(rng, T, frame_len):
    """Training path (pre_process0 minus aug -> pre_process1)."""
    x = _random_landmarks(rng, T)
    stats = _random_stats(rng)
    want = _tf_pre_process1(_tf_groups(tf.constant(x)), stats, frame_len).numpy()
    got = np.asarray(
        preprocess(jnp.asarray(x), jnp.int32(T), stats, frame_len, thin=False))
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
