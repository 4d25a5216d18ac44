"""Dominant-hand canonicalization + LR-flip (reference behaviors: nb4
``process_landmarks`` fewer-NaNs hand selection, ``inference_v3.py``
left-hand detect -> flip, ``data_loader.py:128-137`` LR-flip aug)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.data import landmarks as lm
from ishara_tpu.preprocess.augment import augment, lr_flip
from ishara_tpu.preprocess.pipeline import (
    GroupStats,
    dominant_hand_mirror,
    mirror_lr,
    preprocess,
)


def _hand_cols(group):
    return lm.GROUP_IDX[group].ravel()


def _make_seq(rng, T=40, left_dominant=False, nan_frac=0.8):
    """Random sequence where the non-dominant hand is mostly NaN."""
    x = rng.standard_normal((T, lm.N_COLS)).astype(np.float32) * 0.2 + 0.5
    weak = _hand_cols("rhand") if left_dominant else _hand_cols("lhand")
    mask = rng.random((T, weak.size)) < nan_frac
    cols = np.broadcast_to(weak, mask.shape)
    x[np.arange(T)[:, None] * 0 + np.arange(T)[:, None], cols] = np.where(
        mask, np.nan, x[np.arange(T)[:, None], cols])
    return x


def test_mirror_is_involution(rng):
    x = rng.standard_normal((30, lm.N_COLS)).astype(np.float32)
    back = np.asarray(mirror_lr(mirror_lr(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-6)


def test_mirror_swaps_hands_and_reflects_x(rng):
    x = rng.standard_normal((5, lm.N_COLS)).astype(np.float32)
    m = np.asarray(mirror_lr(jnp.asarray(x)))
    r, l = lm.GROUP_IDX["rhand"], lm.GROUP_IDX["lhand"]
    # x-coords (column 0 of the [n,3] tables) reflect about 0.5 and swap
    np.testing.assert_allclose(m[:, r[:, 0]], 1.0 - x[:, l[:, 0]], atol=1e-6)
    np.testing.assert_allclose(m[:, l[:, 0]], 1.0 - x[:, r[:, 0]], atol=1e-6)
    # y/z swap without reflection
    np.testing.assert_allclose(m[:, r[:, 1]], x[:, l[:, 1]], atol=0)
    np.testing.assert_allclose(m[:, r[:, 2]], x[:, l[:, 2]], atol=0)
    # lips untouched except x-reflection
    lip = lm.GROUP_IDX["lip"]
    np.testing.assert_allclose(m[:, lip[:, 0]], 1.0 - x[:, lip[:, 0]], atol=1e-6)
    np.testing.assert_allclose(m[:, lip[:, 1]], x[:, lip[:, 1]], atol=0)


@pytest.mark.parametrize("left_dominant", [False, True])
def test_dominant_hand_decision_matches_numpy_oracle(rng, left_dominant):
    x = _make_seq(rng, left_dominant=left_dominant)
    T = x.shape[0]
    out, flag = dominant_hand_mirror(jnp.asarray(x), jnp.int32(T))
    l_nan = np.isnan(x[:, _hand_cols("lhand")]).sum()
    r_nan = np.isnan(x[:, _hand_cols("rhand")]).sum()
    want_flip = l_nan < r_nan  # inference_v3.py is_left_handed contract
    assert bool(flag) == bool(want_flip) == left_dominant
    want = np.asarray(mirror_lr(jnp.asarray(x))) if want_flip else x
    np.testing.assert_allclose(np.asarray(out), want, equal_nan=True, atol=0)


def test_dominant_hand_ignores_padding_rows(rng):
    """NaN counting must only see the valid prefix."""
    x = _make_seq(rng, T=20, left_dominant=False)
    padded = np.concatenate(
        [x, np.full((30, lm.N_COLS), np.nan, np.float32)], axis=0)
    # poison the pad rows' left hand with zeros so a full-array count would
    # flip the decision
    padded[20:, _hand_cols("lhand")] = 0.0
    _, flag = dominant_hand_mirror(jnp.asarray(padded), jnp.int32(20))
    assert not bool(flag)


@pytest.mark.parametrize("left_dominant", [False, True])
def test_canonicalization_makes_mirrored_inputs_equal(rng, left_dominant):
    """preprocess(x, dominant_hand=True) == preprocess(mirror(x), ...):
    a signer's mirrored recording produces the identical model input, hence
    identical logits (the VERDICT-required oracle)."""
    x = _make_seq(rng, T=60, left_dominant=left_dominant, nan_frac=0.9)
    stats = GroupStats.identity()
    a = preprocess(jnp.asarray(x), jnp.int32(60), stats, 32,
                   dominant_hand=True)
    b = preprocess(mirror_lr(jnp.asarray(x)), jnp.int32(60), stats, 32,
                   dominant_hand=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mirrored_input_same_logits(rng):
    """End-to-end: identical logits for original vs mirrored input when the
    model preprocesses with dominant_hand=True."""
    from ishara_tpu.config import EncoderConfig
    from ishara_tpu.models.encoder import build_model

    cfg = EncoderConfig(variant="squeezeformer", dim=32,
                        num_squeeze_blocks=1, num_conform_blocks=0,
                        num_heads=4, transformer_kernel_size=3,
                        frame_len=16, dropout=0.0, dominant_hand=True)
    model = build_model(cfg)
    x = _make_seq(rng, T=24, left_dominant=False, nan_frac=0.9)
    stats = GroupStats.identity()

    def logits(raw):
        inp = preprocess(jnp.asarray(raw), jnp.int32(24), stats,
                         cfg.frame_len, dominant_hand=cfg.dominant_hand)
        return model.apply(variables, inp[None], training=False)

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, cfg.frame_len, cfg.input_dim)))
    la = np.asarray(logits(x))
    lb = np.asarray(logits(np.asarray(mirror_lr(jnp.asarray(x)))))
    np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-4)


def test_lr_flip_prob_extremes(rng):
    x = jnp.asarray(rng.standard_normal((10, lm.N_COLS)).astype(np.float32))
    off = lr_flip(jax.random.key(1), x, prob=0.0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(x), atol=0)
    on = lr_flip(jax.random.key(1), x, prob=1.0)
    np.testing.assert_allclose(np.asarray(on), np.asarray(mirror_lr(x)), atol=0)


def test_augment_flip_gate(rng):
    """flip_prob=1 inside augment() flips; flip_prob=0 path is unchanged."""
    x = jnp.asarray(
        rng.standard_normal((12, lm.N_COLS)).astype(np.float32))
    key = jax.random.key(3)
    a0, l0 = augment(key, x, jnp.int32(12), prob=0.0, flip_prob=0.0)
    a1, l1 = augment(key, x, jnp.int32(12), prob=0.0, flip_prob=1.0)
    assert int(l0) == int(l1) == 12
    np.testing.assert_allclose(np.asarray(a1),
                               np.asarray(mirror_lr(a0)), atol=1e-6)
