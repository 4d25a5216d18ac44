"""Training-time augmentations, all jittable and statically shaped.

Covers the union of the reference's augmentation surface:

* time-warp (``pre_process0`` 20%-prob resize to U(0.5,1.5)·T, nb cell 3)
* spatial random affine: rotate/scale/shift on x,y (``asl-translation-nb4``
  ``spatial_random_affine``)
* temporal mask: zero a random contiguous span (nb4 ``temporal_mask``)
* left-right flip: mirror x and swap left/right hand+pose groups
  (``data_loader.py:117-160`` horizontal-flip aug)
* finger dropout: NaN-out random hand landmarks (``data_loader.py`` finger
  dropout)

All operate on the raw ``[Tmax, 276]`` + length representation *before*
:func:`ishara_tpu.preprocess.pipeline.preprocess` and compose under one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data import landmarks as lm


def time_warp(
    key: jax.Array, x: jnp.ndarray, length: jnp.ndarray, prob: float = 0.2
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """With probability ``prob``, resample the valid frames to a random new
    length in [0.5·L, 1.5·L] (clamped to Tmax). Returns (x, new_length)."""
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1) < prob
    factor = jax.random.uniform(k2, minval=0.5, maxval=1.5)
    Tmax = x.shape[0]
    new_len = jnp.clip(
        (length.astype(jnp.float32) * factor).astype(jnp.int32), 1, Tmax
    )
    # resample valid prefix [0, length) to new_len frames: reuse the bilinear
    # sampler by mapping output rows [0, new_len) over source length
    i = jnp.arange(Tmax, dtype=jnp.float32)
    src = (i + 0.5) * (length.astype(jnp.float32) / new_len.astype(jnp.float32)) - 0.5
    src = jnp.clip(src, 0.0, jnp.maximum(length.astype(jnp.float32) - 1.0, 0.0))
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(length - 1, 0))
    w = (src - jnp.floor(src))[:, None]
    warped = x[lo] * (1.0 - w) + x[hi] * w
    warped = jnp.where((jnp.arange(Tmax) < new_len)[:, None], warped, jnp.nan)
    return (
        jnp.where(apply, warped, x),
        jnp.where(apply, new_len, length),
    )


def time_shift(
    key: jax.Array, x: jnp.ndarray, length: jnp.ndarray,
    max_shift: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift the sequence by up to ±max_shift frames (data_loader.py:130-136
    'Random shift along time axis'). Expressed as a random crop so the
    valid-prefix contract of the pipeline holds: positive shift drops leading
    frames, negative drops trailing ones."""
    shift = jax.random.randint(key, (), -max_shift, max_shift + 1)
    start = jnp.maximum(shift, 0)
    out = jnp.roll(x, -start, axis=0)
    new_len = jnp.clip(length - jnp.abs(shift), 1, x.shape[0])
    return out, new_len


def _xyz_views(x: jnp.ndarray):
    n = lm.N_LANDMARKS
    return x[:, :n], x[:, n : 2 * n], x[:, 2 * n :]


def spatial_affine(
    key: jax.Array,
    x: jnp.ndarray,
    max_rot_deg: float = 10.0,
    scale_range: tuple[float, float] = (0.8, 1.2),
    max_shift: float = 0.1,
) -> jnp.ndarray:
    """Random rotate+scale+shift applied to (x, y); z untouched."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    theta = jnp.deg2rad(
        jax.random.uniform(k1, minval=-max_rot_deg, maxval=max_rot_deg)
    )
    scale = jax.random.uniform(k2, minval=scale_range[0], maxval=scale_range[1])
    shift = jax.random.uniform(k3, (2,), minval=-max_shift, maxval=max_shift)
    del k4
    xs, ys, zs = _xyz_views(x)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotate about (0.5, 0.5) — landmark coords are normalized to [0, 1]
    cx, cy = 0.5, 0.5
    xr = (xs - cx) * c - (ys - cy) * s
    yr = (xs - cx) * s + (ys - cy) * c
    xs2 = xr * scale + cx + shift[0]
    ys2 = yr * scale + cy + shift[1]
    return jnp.concatenate([xs2, ys2, zs], axis=1)


def temporal_mask(
    key: jax.Array, x: jnp.ndarray, length: jnp.ndarray, max_frac: float = 0.15
) -> jnp.ndarray:
    """NaN-out a random contiguous span of up to ``max_frac``·L frames."""
    k1, k2 = jax.random.split(key)
    L = length.astype(jnp.float32)
    span = (jax.random.uniform(k1) * max_frac * L).astype(jnp.int32)
    start = (jax.random.uniform(k2) * jnp.maximum(L - span, 1)).astype(jnp.int32)
    t = jnp.arange(x.shape[0])
    hit = (t >= start) & (t < start + span)
    return jnp.where(hit[:, None], jnp.nan, x)


def lr_flip(key: jax.Array, x: jnp.ndarray, prob: float = 0.5) -> jnp.ndarray:
    """Mirror x-coordinates about 0.5 and swap left/right hand+pose groups
    (reference ``data_loader.py:128-137`` LR-flip aug; mirror semantics in
    :func:`ishara_tpu.preprocess.pipeline.mirror_lr`)."""
    from .pipeline import mirror_lr

    apply = jax.random.uniform(key) < prob
    return jnp.where(apply, mirror_lr(x), x)


def finger_dropout(
    key: jax.Array, x: jnp.ndarray, prob: float = 0.1
) -> jnp.ndarray:
    """Independently NaN-out each hand landmark (all coords) with ``prob``."""
    n = lm.N_LANDMARKS
    drop = jax.random.bernoulli(key, prob, (2 * lm.N_HAND,))  # hands occupy cols 0..41
    mask = jnp.zeros((n,), bool).at[:42].set(drop)
    mask = jnp.concatenate([mask, mask, mask])
    return jnp.where(mask[None, :], jnp.nan, x)


def augment(
    key: jax.Array,
    x: jnp.ndarray,
    length: jnp.ndarray,
    prob: float = 0.2,
    flip_prob: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite augmentation applied with the reference's 20% gate for the
    warp plus independent gates for the rest.

    ``flip_prob`` enables the LR-flip aug (reference data_loader.py p=0.5);
    default 0.0 because flipping fights the ``dominant_hand`` canonicalization
    — enable one or the other (TrainConfig.lr_flip_prob)."""
    (k_warp, k_aff, k_affp, k_tm, k_tmp, k_flip, k_fd, k_fdp,
     k_sh, k_shp) = jax.random.split(key, 10)
    x, length = time_warp(k_warp, x, length, prob=prob)
    shifted, shifted_len = time_shift(k_sh, x, length)
    do_shift = jax.random.uniform(k_shp) < prob
    x = jnp.where(do_shift, shifted, x)
    length = jnp.where(do_shift, shifted_len, length)
    x = jnp.where(jax.random.uniform(k_affp) < prob, spatial_affine(k_aff, x), x)
    x = jnp.where(jax.random.uniform(k_tmp) < prob, temporal_mask(k_tm, x, length), x)
    x = jnp.where(
        jax.random.uniform(k_fdp) < prob, finger_dropout(k_fd, x), x
    )
    if flip_prob > 0.0:
        x = lr_flip(k_flip, x, prob=flip_prob)
    return x, length
