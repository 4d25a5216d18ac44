"""Causal mode + stateful streaming (serve/streaming.py, ROADMAP #5).

The load-bearing contract: feeding a sequence chunk-by-chunk through
StreamingEncoder produces the SAME logits as the batch causal forward on
the full sequence — i.e. the per-block state (K/V caches, conv tails,
running-mean SE) exactly reproduces what the batch program computes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.config import EncoderConfig
from ishara_tpu.models import IsharaEncoder
from ishara_tpu.preprocess import GroupStats
from ishara_tpu.preprocess.pipeline import _OUT_PERM
from ishara_tpu.serve.streaming import StreamingEncoder


def _causal_cfg(**kw):
    base = dict(dim=32, variant="hybrid", num_squeeze_blocks=1,
                num_conform_blocks=1, num_heads=4, frame_len=32,
                transformer_kernel_size=7, expansion_factor=2,
                dropout=0.0, top_dropout=0.0, top_mult=1,
                causal=True, attn_context=32)
    base.update(kw)
    return EncoderConfig(**base)


def _variables(cfg, seed=0):
    model = IsharaEncoder(cfg)
    x0 = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    variables = model.init(jax.random.key(seed), x0)
    # non-trivial BN running stats so streaming must actually carry them
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.default_rng(1).standard_normal(a.shape) ** 2 * 0.3
            + 0.5, jnp.float32),
        variables["batch_stats"])
    return model, {"params": variables["params"], "batch_stats": bs}


def _raw_frames(rng, T):
    # raw landmark layout [T, 276]; keep away from 0 so frame_mask is all-True
    return (rng.random((T, 276)).astype(np.float32) * 0.8 + 0.1)


def _batch_causal_logits(model, variables, raw):
    """The batch path on identically-normalized input (no resampling: feed
    frames straight through the stem, as streaming does)."""
    x = jnp.asarray(raw)[:, _OUT_PERM]  # identity stats: mean 0 std 1
    return model.apply(variables, x[None], training=False)[0]


@pytest.mark.parametrize("variant,chunk", [("hybrid", 8), ("hybrid", 4),
                                           ("squeezeformer", 8),
                                           ("conformer", 8)])
def test_streaming_matches_batch_causal(rng, variant, chunk):
    cfg = _causal_cfg(variant=variant)
    model, variables = _variables(cfg)
    T = cfg.frame_len
    raw = _raw_frames(rng, T)
    want = np.asarray(_batch_causal_logits(model, variables, raw))

    eng = StreamingEncoder(cfg, variables, chunk_size=chunk)
    state = eng.init_state()
    got = []
    for i in range(0, T, chunk):
        state, _, _, logits = eng.step(state, raw[i:i + chunk])
        got.append(np.asarray(logits))
    got = np.concatenate(got)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_streaming_matches_batch_with_invalid_frames(rng):
    """Frames with zero signal (tracking dropout) are excluded from
    attention keys and the SE running mean in BOTH paths — parity must hold
    through a mid-stream dropout burst."""
    cfg = _causal_cfg(variant="hybrid")
    model, variables = _variables(cfg)
    T = cfg.frame_len
    raw = _raw_frames(rng, T)
    raw[10:14] = 0.0   # dropout burst inside the stream
    raw[-4:] = 0.0     # and a trailing one
    want = np.asarray(_batch_causal_logits(model, variables, raw))

    eng = StreamingEncoder(cfg, variables, chunk_size=8)
    state = eng.init_state()
    got = []
    for i in range(0, T, 8):
        state, _, _, logits = eng.step(state, raw[i:i + 8])
        got.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(got), want,
                               rtol=2e-4, atol=2e-4)


def test_streaming_bounded_context_matches_windowed_batch(rng):
    """With attn_context < T the streaming output still equals the batch
    causal forward (whose mask applies the same window)."""
    cfg = _causal_cfg(variant="hybrid", attn_context=12)
    model, variables = _variables(cfg)
    T = cfg.frame_len
    raw = _raw_frames(rng, T)
    want = np.asarray(_batch_causal_logits(model, variables, raw))

    eng = StreamingEncoder(cfg, variables, chunk_size=4)
    state = eng.init_state()
    got = []
    for i in range(0, T, 4):
        state, _, _, logits = eng.step(state, raw[i:i + 4])
        got.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(got), want,
                               rtol=2e-4, atol=2e-4)


def test_streaming_beyond_frame_len(rng):
    """Streaming keeps going past frame_len (the batch path's resample
    horizon) — state and positional encoding extend to max_positions."""
    cfg = _causal_cfg(variant="hybrid", attn_context=16)
    _, variables = _variables(cfg)
    eng = StreamingEncoder(cfg, variables, chunk_size=8, max_positions=256)
    state = eng.init_state()
    for i in range(20):  # 160 frames >> frame_len=32
        state, ids, n, logits = eng.step(state, _raw_frames(rng, 8))
        assert np.isfinite(np.asarray(logits)).all()
    assert int(state.pos) == 160


def test_incremental_ctc_collapse(rng):
    """The emitted ids across chunk boundaries equal a full greedy collapse
    of the concatenated argmax sequence."""
    cfg = _causal_cfg(variant="squeezeformer")
    model, variables = _variables(cfg, seed=3)
    T = cfg.frame_len
    raw = _raw_frames(rng, T)
    logits = np.asarray(_batch_causal_logits(model, variables, raw))
    ids = logits.argmax(-1)
    want, prev = [], cfg.blank_id
    for t in ids:
        if t != prev and t != cfg.blank_id:
            want.append(int(t))
        prev = int(t)

    eng = StreamingEncoder(cfg, variables, chunk_size=8)
    state = eng.init_state()
    emitted = []
    for i in range(0, T, 8):
        state, out_ids, n, _ = eng.step(state, raw[i:i + 8])
        emitted.append(out_ids)
    got = StreamingEncoder.collect(emitted)
    assert got == want
    assert eng.decode_text(got) == eng.decode_text(want)


def test_causal_training_step_runs(rng):
    """A causal model trains end-to-end through the standard fused step."""
    from ishara_tpu.config import TrainConfig
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.train import TrainState, make_optimizer
    from ishara_tpu.train.state import make_fused_ctc_train_step

    cfg = _causal_cfg(variant="hybrid", dropout=0.1)
    model = IsharaEncoder(cfg)
    tok = CTCTokenizer()
    ds = SyntheticASLFR(num_sequences=8, seed=0, max_phrase=5)
    batch = ds.batch(range(8), tok, max_frames=48)
    tx, _ = make_optimizer(TrainConfig(steps_per_epoch=10))
    sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    state = TrainState.create(model, tx, sample)
    step = make_fused_ctc_train_step(GroupStats.identity(), cfg.frame_len,
                                     aug_prob=0.0, blank_id=cfg.blank_id)
    jb = {k: jnp.asarray(batch[k]) for k in ("raw", "lengths", "labels")}
    l0 = None
    for i in range(4):
        state, m = step(state, jb, jax.random.key(1))
        l0 = l0 or float(m["loss"])
    assert np.isfinite(float(m["loss"]))


def test_guards(rng):
    cfg = _causal_cfg(causal=False)
    _, variables = _variables(dataclasses.replace(cfg, causal=True))
    with pytest.raises(ValueError):
        StreamingEncoder(cfg, variables)
    with pytest.raises(ValueError):
        StreamingEncoder(_causal_cfg(attn_context=0), variables)
    with pytest.raises(ValueError):
        # whole-sequence dominant-hand canonicalization cannot stream
        StreamingEncoder(_causal_cfg(dominant_hand=True), variables)
    # PE table exhaustion raises instead of silently clamping
    eng = StreamingEncoder(_causal_cfg(attn_context=8), variables,
                           chunk_size=8, max_positions=16)
    state = eng.init_state()
    state, *_ = eng.step(state, _raw_frames(rng, 8))
    state, *_ = eng.step(state, _raw_frames(rng, 8))
    with pytest.raises(ValueError):
        eng.step(state, _raw_frames(rng, 8))
    # fused serving kernels refuse causal configs (semantics mismatch)
    from ishara_tpu.ops.fused_block import fused_encoder_forward

    with pytest.raises(ValueError):
        fused_encoder_forward(_causal_cfg(), variables,
                              jnp.zeros((32, 276)), interpret=True)
    cfg_conv = EncoderConfig(variant="conv_hybrid", dim=32, frame_len=16,
                             causal=True)
    with pytest.raises(ValueError):
        IsharaEncoder(cfg_conv).init(
            jax.random.key(0), jnp.zeros((1, 16, 276)))
