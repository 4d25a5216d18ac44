"""Jittable landmark preprocessing pipeline.

Re-implements the behavioral contract of the reference's TF preprocessing
(``Test Notebooks/conv-squeezeformer-conformer-test.ipynb`` cell 3:
``resize_pad`` / ``pre_process0`` / ``pre_process00`` / ``pre_process1``) as a
TPU-first design: every function is statically shaped and jittable, with the
dynamic sequence length carried as a traced scalar instead of a dynamic tensor
shape. Raw sequences are padded on the host to a static ``max_frames`` and the
whole select → thin → resample/pad → normalize → flatten chain runs as one XLA
program (fusable into the serving executable).

Data layout: raw input is ``[T, 276]`` (x/y/z blocks of 92 landmarks, see
``ishara_tpu.data.landmarks``); model input is ``[FRAME_LEN, 276]`` ordered
lip(40) | rhand(21) | lhand(21) | rpose(5) | lpose(5), each as x,y,z triples.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import landmarks as lm


class GroupStats(NamedTuple):
    """Per-group normalization statistics, broadcastable against [T, n, 3]."""

    mean: dict[str, jnp.ndarray]
    std: dict[str, jnp.ndarray]

    @staticmethod
    def identity() -> "GroupStats":
        return GroupStats(
            mean={g: jnp.zeros((1, 1, 3), jnp.float32) for g in lm.GROUPS},
            std={g: jnp.ones((1, 1, 3), jnp.float32) for g in lm.GROUPS},
        )


def split_groups(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """[T, 276] flat frame -> dict of [T, n_g, 3] group tensors.

    One gather per group using the precomputed [n, 3] column-index tables
    (equivalent to the reference's 15 separate tf.gather calls in
    ``pre_process0``).
    """
    return {g: jnp.take(x, lm.GROUP_IDX[g], axis=1) for g in lm.GROUPS}


def merge_groups(groups: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Concat groups along the landmark axis and flatten to [T, 276]."""
    x = jnp.concatenate([groups[g] for g in lm.CONCAT_ORDER], axis=1)
    return x.reshape(x.shape[0], -1)


def resample_or_pad(x: jnp.ndarray, length: jnp.ndarray, frame_len: int) -> jnp.ndarray:
    """Fixed-shape equivalent of the reference's ``resize_pad``.

    ``x`` is [Tmax, ...] with valid data in rows [0, length); output is
    [frame_len, ...]. Sequences shorter than ``frame_len`` are NaN-padded at
    the end; longer ones are bilinearly resampled along time with TF2
    half-pixel-center semantics (``tf.image.resize``).

    Statically shaped: both branches are computed and selected per-row, which
    XLA fuses into one gather + lerp.
    """
    length = jnp.asarray(length, jnp.float32)
    i = jnp.arange(frame_len, dtype=jnp.float32)

    # Resample branch (length > frame_len): half-pixel-center bilinear.
    src = (i + 0.5) * (length / frame_len) - 0.5
    src = jnp.clip(src, 0.0, jnp.maximum(length - 1.0, 0.0))
    lo = jnp.floor(src)
    w = (src - lo)[(...,) + (None,) * (x.ndim - 1)]
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, jnp.maximum(length.astype(jnp.int32) - 1, 0))
    resized = x[lo_i] * (1.0 - w) + x[hi_i] * w

    # Pad branch (length <= frame_len): copy then NaN-fill the tail.
    idx = jnp.minimum(jnp.arange(frame_len), x.shape[0] - 1)
    copied = x[idx]
    row_valid = (jnp.arange(frame_len, dtype=jnp.float32) < length)[
        (...,) + (None,) * (x.ndim - 1)
    ]
    padded = jnp.where(row_valid, copied, jnp.nan)

    return jnp.where(length <= frame_len, padded, resized)


# Mirror permutation: swap right<->left hand blocks and RPOSE<->LPOSE blocks
# within each coordinate (layout rhand(21) | lhand(21) | LPOSE(5) | RPOSE(5) |
# lip(40); the pose lists are anatomically mirrored pairs, so a block swap is
# elementwise-correct). Lip columns are left untouched, matching the
# reference's flip (data_loader.py:128-137 swaps only the hand blocks).
def _mirror_perm() -> jnp.ndarray:
    n = lm.N_LANDMARKS
    perm = np.arange(n)
    perm[0:21], perm[21:42] = np.arange(21, 42), np.arange(0, 21)
    perm[42:47], perm[47:52] = np.arange(47, 52), np.arange(42, 47)
    return jnp.asarray(np.concatenate([perm, perm + n, perm + 2 * n]))


_MIRROR_PERM = _mirror_perm()


def mirror_lr(x: jnp.ndarray) -> jnp.ndarray:
    """Mirror a [T, 276] sequence left<->right: swap hand/pose blocks and
    reflect x-coordinates about 0.5 (MediaPipe coords live in [0, 1]).

    Involution: ``mirror_lr(mirror_lr(x)) == x``. The reference's torch-path
    flip negates x (``data_loader.py:137`` ``*= -1``) instead of reflecting
    about the frame center — a quirk NOT kept, since negation moves landmarks
    out of the normalized frame; 0.5-reflection composes correctly with the
    precomputed per-group stats and the serve-side flip.
    """
    flipped = x[:, _MIRROR_PERM]
    n = lm.N_LANDMARKS
    return flipped.at[:, :n].set(1.0 - flipped[:, :n])


def dominant_hand_mirror(
    x: jnp.ndarray, length: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Canonicalize handedness: if the LEFT hand has more signal (fewer NaNs
    over the valid frames) than the right, mirror the sequence so the dominant
    hand is always the right hand.

    Behavioral contract: nb4 ``process_landmarks`` dominant-hand selection
    (fewer-NaNs hand wins) + ``inference tests/inference_v3.py:21-30``
    left-hand detect -> ``flip_lr``, fused into the jitted preprocess.
    Returns (x, left_was_dominant flag).
    """
    valid = (jnp.arange(x.shape[0]) < length)[:, None]
    r_nan = jnp.sum(
        jnp.isnan(jnp.take(x, lm.GROUP_IDX["rhand"].ravel(), axis=1)) & valid)
    l_nan = jnp.sum(
        jnp.isnan(jnp.take(x, lm.GROUP_IDX["lhand"].ravel(), axis=1)) & valid)
    left_dominant = l_nan < r_nan
    return jnp.where(left_dominant, mirror_lr(x), x), left_dominant


def thin_frames(
    x: jnp.ndarray, length: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-time frame thinning (reference ``pre_process00``).

    Keeps frames that have hand signal (non-NaN, non-zero hand landmarks) OR
    are at an even position, compacting the kept frames to the front. Returns
    the compacted [Tmax, 276] array and the new valid length.

    The reference's boolean-mask gather produces a dynamic shape; here the
    kept rows are compacted to the front with a cumsum-rank gather (the j-th
    output row is the (j+1)-th kept row, found by counting how many prefix
    sums fall below j+1). A [T, T] compare + row-sum is pure VPU work —
    measured 4x faster than the previous stable-argsort compaction, which
    dominated the serving program (38 of 122 us; RESULTS.md round 2).
    Rows at or beyond the returned length are unspecified (clamped gather of
    the last row); every consumer (``resample_or_pad``) masks on length.
    """
    T = x.shape[0]
    valid = jnp.arange(T) < length

    hands = jnp.concatenate(
        [jnp.take(x, lm.GROUP_IDX["rhand"], axis=1),
         jnp.take(x, lm.GROUP_IDX["lhand"], axis=1)],
        axis=1,
    )
    hands = jnp.nan_to_num(hands, nan=0.0)
    signal = jnp.sum(hands, axis=(1, 2)) != 0.0
    alternating = (jnp.arange(T) % 2) == 0  # cumsum(ones) % 2 == 1 keeps even rows
    keep = (signal | alternating) & valid

    csum = jnp.cumsum(keep.astype(jnp.int32))
    targets = jnp.arange(1, T + 1, dtype=jnp.int32)[:, None]
    idx = jnp.sum((csum[None, :] < targets).astype(jnp.int32), axis=1)
    return x[jnp.minimum(idx, T - 1)], csum[-1]


def normalize_groups(
    groups: dict[str, jnp.ndarray], stats: GroupStats
) -> dict[str, jnp.ndarray]:
    """Per-group (x - mean) / std (reference ``pre_process1``)."""
    return {
        g: (groups[g] - stats.mean[g]) / stats.std[g] for g in lm.GROUPS
    }


# Flat output-column permutation: output column j reads input column
# _OUT_PERM[j], giving the lip|rhand|lhand|rpose|lpose x,y,z-triple layout
# that split->merge produced group-by-group.
_OUT_PERM = jnp.asarray(
    np.concatenate([np.asarray(lm.GROUP_IDX[g]).ravel()
                    for g in lm.CONCAT_ORDER]))


def _flat_stats(stats: GroupStats) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Broadcast the per-group [1, 1, 3] (or [1, n, 3]) stats to flat
    [276] vectors in output-column order."""
    means, stds = [], []
    for g in lm.CONCAT_ORDER:
        n = lm.GROUP_IDX[g].shape[0]
        means.append(jnp.broadcast_to(stats.mean[g], (1, n, 3)).reshape(-1))
        stds.append(jnp.broadcast_to(stats.std[g], (1, n, 3)).reshape(-1))
    return jnp.concatenate(means), jnp.concatenate(stds)


def preprocess(
    x: jnp.ndarray,
    length: jnp.ndarray,
    stats: GroupStats,
    frame_len: int = lm.FRAME_LEN,
    thin: bool = False,
    dominant_hand: bool = False,
) -> jnp.ndarray:
    """Full preprocessing: [Tmax, 276] raw + valid length -> [frame_len, 276].

    ``thin=True`` applies the inference-path frame thinning
    (``pre_process00``); training uses ``thin=False`` (``pre_process0`` path,
    augmentation handled separately in :mod:`ishara_tpu.preprocess.augment`).
    ``dominant_hand=True`` first canonicalizes handedness by mirroring
    left-dominant sequences (:func:`dominant_hand_mirror`) — must be set
    consistently between training and serving.

    Computed flat rather than group-by-group: one time-resample on the whole
    [Tmax, 276] array, one column-permutation gather, one scale/shift with
    precomputed [276] vectors. Exactly equivalent to the reference's
    split -> per-group resize -> normalize -> concat (resampling is
    per-column linear, so it commutes with the column permutation; proven
    against the TF oracles in test_tf_oracles.py), but ~6 ops instead of
    ~15x3 — the group-wise version measured 38 of the 122 us batch-1
    serving program (RESULTS.md round 2).
    """
    if dominant_hand:
        x, _ = dominant_hand_mirror(x, length)
    if thin:
        x, length = thin_frames(x, length)
    mean, std = _flat_stats(stats)
    out = resample_or_pad(x, length, frame_len)[:, _OUT_PERM]
    out = (out - mean) / std
    return jnp.nan_to_num(out, nan=0.0)


def preprocess_batch(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    stats: GroupStats,
    frame_len: int = lm.FRAME_LEN,
    thin: bool = False,
    dominant_hand: bool = False,
) -> jnp.ndarray:
    """vmapped :func:`preprocess` over a [B, Tmax, 276] batch."""
    return jax.vmap(
        lambda xi, li: preprocess(xi, li, stats, frame_len, thin, dominant_hand)
    )(x, lengths)


def frame_mask(x: jnp.ndarray) -> jnp.ndarray:
    """Keras ``Masking(0.0)`` semantics: a frame is valid if any feature != 0.

    Reference: ``get_model`` stem (nb cell 7). Returns [..., T] boolean.
    """
    return jnp.any(x != 0.0, axis=-1)


def numpy_oracle_preprocess(
    x: np.ndarray,
    stats: GroupStats | None = None,
    frame_len: int = lm.FRAME_LEN,
    thin: bool = False,
) -> np.ndarray:
    """Straightforward numpy re-statement of the reference semantics, used as
    the golden oracle in tests (dynamic shapes allowed here)."""
    stats = stats or GroupStats.identity()
    if thin:
        hands_idx = np.concatenate(
            [lm.GROUP_IDX["rhand"], lm.GROUP_IDX["lhand"]], axis=0
        )
        hands = np.nan_to_num(
            np.stack([x[:, hands_idx[:, c]] for c in range(3)], -1), nan=0.0
        )
        signal = hands.sum(axis=(1, 2)) != 0.0
        alternating = (np.arange(x.shape[0]) % 2) == 0
        x = x[signal | alternating]
    out_groups = []
    for g in lm.CONCAT_ORDER:
        grp = np.stack([x[:, lm.GROUP_IDX[g][:, c]] for c in range(3)], axis=-1)
        T = grp.shape[0]
        if T < frame_len:
            pad = np.full((frame_len - T,) + grp.shape[1:], np.nan, grp.dtype)
            grp = np.concatenate([grp, pad], axis=0)
        elif T > frame_len:
            scale = T / frame_len
            src = np.clip((np.arange(frame_len) + 0.5) * scale - 0.5, 0, T - 1)
            lo = np.floor(src).astype(int)
            hi = np.minimum(lo + 1, T - 1)
            w = (src - lo)[:, None, None]
            grp = grp[lo] * (1 - w) + grp[hi] * w
        grp = (grp - np.asarray(stats.mean[g])) / np.asarray(stats.std[g])
        out_groups.append(grp)
    out = np.concatenate(out_groups, axis=1).reshape(frame_len, -1)
    return np.nan_to_num(out, nan=0.0)
