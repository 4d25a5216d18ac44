"""Serving-client pure functions (no camera/mediapipe needed)."""

from types import SimpleNamespace

import numpy as np

from ishara_tpu.data import landmarks as lm
from ishara_tpu.serve.clients import mediapipe_to_frame, nan_filter_left_hand_flip


def fake_results(right=True, left=False):
    def hand():
        return SimpleNamespace(landmark=[
            SimpleNamespace(x=0.1 * i, y=0.2 * i, z=0.3 * i)
            for i in range(21)
        ])

    pose = SimpleNamespace(landmark=[
        SimpleNamespace(x=0.5, y=0.5, z=0.0) for _ in range(33)])
    face = SimpleNamespace(landmark=[
        SimpleNamespace(x=0.4, y=0.6, z=0.1) for _ in range(478)])
    return SimpleNamespace(
        right_hand_landmarks=hand() if right else None,
        left_hand_landmarks=hand() if left else None,
        pose_landmarks=pose,
        face_landmarks=face,
    )


def test_mediapipe_to_frame_layout():
    frame = mediapipe_to_frame(fake_results(right=True, left=False))
    assert frame.shape == (lm.N_COLS,)
    # right hand filled, left hand NaN
    assert np.isfinite(frame[lm.GROUP_IDX["rhand"][:, 0]]).all()
    assert np.isnan(frame[lm.GROUP_IDX["lhand"][:, 0]]).all()
    # y coordinate of right_hand_1 lands in the Y block
    i = lm.SEL_COLS.index("x_right_hand_1")
    assert frame[i + lm.N_LANDMARKS] == np.float32(0.2)
    # lip + pose filled
    assert np.isfinite(frame[lm.GROUP_IDX["lip"][:, 0]]).all()
    assert np.isfinite(frame[lm.GROUP_IDX["rpose"][:, 0]]).all()


def test_nan_filter_flip_swaps_dominant_hand():
    T = 5
    x = np.full((T, lm.N_COLS), np.nan, np.float32)
    # left hand has signal, right hand is NaN -> should flip
    x[:, lm.GROUP_IDX["lhand"][:, 0]] = 0.25
    out = nan_filter_left_hand_flip(x)
    # after flip the RIGHT hand columns carry the (mirrored) signal
    np.testing.assert_allclose(
        out[:, lm.GROUP_IDX["rhand"][:, 0]], 1.0 - 0.25)
    assert np.isnan(out[:, lm.GROUP_IDX["lhand"][:, 0]]).all()


def test_nan_filter_noop_when_right_dominant():
    T = 4
    x = np.full((T, lm.N_COLS), np.nan, np.float32)
    x[:, lm.GROUP_IDX["rhand"][:, 0]] = 0.7
    out = nan_filter_left_hand_flip(x)
    np.testing.assert_allclose(out[:, lm.GROUP_IDX["rhand"][:, 0]], 0.7)
