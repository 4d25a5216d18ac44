import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.data import landmarks as lm
from ishara_tpu.preprocess import (
    GroupStats,
    frame_mask,
    numpy_oracle_preprocess,
    preprocess,
    preprocess_batch,
    resample_or_pad,
    split_groups,
    thin_frames,
)

MAX_T = 256


def make_seq(rng, T, nan_frac=0.2):
    x = rng.standard_normal((T, lm.N_COLS)).astype(np.float32)
    mask = rng.random((T, lm.N_COLS)) < nan_frac
    x[mask] = np.nan
    return x


def pad_to(x, Tmax):
    out = np.zeros((Tmax, x.shape[1]), np.float32)
    out[: x.shape[0]] = x
    return out


def test_group_split_layout(rng):
    x = make_seq(rng, 8, nan_frac=0.0)
    groups = split_groups(jnp.asarray(x))
    sizes = {g: groups[g].shape[1] for g in groups}
    assert sizes == {"lip": 40, "rhand": 21, "lhand": 21, "rpose": 5, "lpose": 5}
    # x/y/z of a landmark land in the last axis (column blocks of 92)
    np.testing.assert_allclose(np.asarray(groups["rhand"])[0, 0], x[0, [0, 92, 184]])


@pytest.mark.parametrize("T", [1, 40, 176, 200, 256])
def test_preprocess_matches_numpy_oracle(rng, T):
    x = make_seq(rng, T)
    stats = GroupStats.identity()
    got = np.asarray(
        jax.jit(lambda a, l: preprocess(a, l, stats, frame_len=176))(
            jnp.asarray(pad_to(x, MAX_T)), jnp.int32(T)
        )
    )
    want = numpy_oracle_preprocess(x, stats, frame_len=176)
    assert got.shape == (176, 276)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("T", [10, 100, 250])
def test_preprocess_thin_matches_oracle(rng, T):
    x = make_seq(rng, T, nan_frac=0.5)
    stats = GroupStats.identity()
    got = np.asarray(
        jax.jit(lambda a, l: preprocess(a, l, stats, frame_len=176, thin=True))(
            jnp.asarray(pad_to(x, MAX_T)), jnp.int32(T)
        )
    )
    want = numpy_oracle_preprocess(x, stats, frame_len=176, thin=True)
    # oracle interpolates in float64; device path is float32
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_thin_keeps_signal_frames(rng):
    T = 20
    x = np.zeros((T, lm.N_COLS), np.float32)
    x[:] = np.nan
    # hand signal only on frames 3 and 7
    x[3, lm.GROUP_IDX["rhand"][0, 0]] = 1.0
    x[7, lm.GROUP_IDX["lhand"][0, 0]] = 2.0
    _, newlen = thin_frames(jnp.asarray(x), jnp.int32(T))
    # evens (10 frames) + frames 3 and 7
    assert int(newlen) == 12


def test_resample_or_pad_short_pads_nan():
    x = jnp.ones((10, 4, 3))
    out = resample_or_pad(x, 6, 8)
    assert out.shape == (8, 4, 3)
    assert np.isfinite(np.asarray(out[:6])).all()
    assert np.isnan(np.asarray(out[6:])).all()


def test_resample_matches_tf_half_pixel_semantics():
    # downsample 8 -> 4 of a linear ramp: half-pixel centers give exact midpoints
    x = jnp.arange(8.0)[:, None, None]
    out = np.asarray(resample_or_pad(x, 8, 4)).ravel()
    np.testing.assert_allclose(out, [0.5, 2.5, 4.5, 6.5], atol=1e-6)


def test_normalization_applied(rng):
    x = make_seq(rng, 50, nan_frac=0.0)
    stats = GroupStats(
        mean={g: jnp.full((1, 1, 3), 2.0) for g in lm.GROUPS},
        std={g: jnp.full((1, 1, 3), 4.0) for g in lm.GROUPS},
    )
    got = np.asarray(preprocess(jnp.asarray(pad_to(x, 64)), 50, stats, frame_len=50))
    want = numpy_oracle_preprocess(x, stats, frame_len=50)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_preprocess_batch_vmap(rng):
    xs = np.stack([pad_to(make_seq(rng, 100), MAX_T) for _ in range(4)])
    lens = np.array([100, 100, 100, 100], np.int32)
    out = preprocess_batch(jnp.asarray(xs), jnp.asarray(lens), GroupStats.identity())
    assert out.shape == (4, lm.FRAME_LEN, lm.N_COLS)
    assert np.isfinite(np.asarray(out)).all()


def test_frame_mask_semantics():
    x = jnp.zeros((2, 5, 276)).at[0, :3, 0].set(1.0)
    m = np.asarray(frame_mask(x))
    assert m[0].tolist() == [True, True, True, False, False]
    assert not m[1].any()
