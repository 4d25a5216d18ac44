"""Augmentation invariants: shapes, lengths, NaN placement, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.data import landmarks as lm
from ishara_tpu.preprocess.augment import (
    augment,
    finger_dropout,
    lr_flip,
    spatial_affine,
    temporal_mask,
    time_shift,
    time_warp,
)

T = 64


def seq(rng):
    return jnp.asarray(rng.standard_normal((T, lm.N_COLS)).astype(np.float32))


def test_time_warp_changes_length(rng):
    x = seq(rng)
    key = jax.random.key(3)
    x2, l2 = time_warp(key, x, jnp.int32(50), prob=1.0)
    assert x2.shape == x.shape
    assert 25 <= int(l2) <= 64
    # frames past the new length are NaN
    assert np.isnan(np.asarray(x2[int(l2):])).all()


def test_time_shift_preserves_prefix_contract(rng):
    x = seq(rng)
    x2, l2 = time_shift(jax.random.key(0), x, jnp.int32(40))
    assert 30 <= int(l2) <= 40
    assert np.isfinite(np.asarray(x2[: int(l2)])).all()


def test_spatial_affine_preserves_z(rng):
    x = seq(rng)
    x2 = spatial_affine(jax.random.key(1), x)
    n = lm.N_LANDMARKS
    np.testing.assert_allclose(np.asarray(x2[:, 2 * n:]),
                               np.asarray(x[:, 2 * n:]))
    assert not np.allclose(np.asarray(x2[:, :n]), np.asarray(x[:, :n]))


def test_temporal_mask_nans_span(rng):
    x = seq(rng)
    x2 = temporal_mask(jax.random.key(2), x, jnp.int32(T), max_frac=0.5)
    nan_rows = np.isnan(np.asarray(x2)).all(axis=1)
    if nan_rows.any():
        idx = np.where(nan_rows)[0]
        assert (np.diff(idx) == 1).all()  # contiguous


def test_lr_flip_swaps_hands(rng):
    x = seq(rng)
    x2 = lr_flip(jax.random.key(5), x, prob=1.0)
    # right hand x becomes 1 - left hand x
    np.testing.assert_allclose(
        np.asarray(x2[:, 0:21]), 1.0 - np.asarray(x[:, 21:42]), rtol=1e-6)


def test_finger_dropout_only_hits_hands(rng):
    x = seq(rng)
    x2 = finger_dropout(jax.random.key(4), x, prob=0.5)
    n = lm.N_LANDMARKS
    for blk in range(3):
        non_hand = np.asarray(x2[:, blk * n + 42: (blk + 1) * n])
        assert np.isfinite(non_hand).all()


def test_composite_augment_deterministic(rng):
    x = seq(rng)
    k = jax.random.key(9)
    a1, l1 = augment(k, x, jnp.int32(T), prob=0.5)
    a2, l2 = augment(k, x, jnp.int32(T), prob=0.5)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert int(l1) == int(l2)
