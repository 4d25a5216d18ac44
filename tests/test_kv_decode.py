"""KV-cached autoregressive decode parity (VERDICT r2 next-round #2).

The cached path (decode/autoregressive.py greedy_translate_cached +
DecoderLayer.step) must produce the same tokens as the full-prefix-recompute
oracle (greedy_translate) — same parameters, same inputs, deterministic
dropout, so any divergence is a cache-indexing or masking bug."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.decode.autoregressive import (
    greedy_translate,
    greedy_translate_cached,
)
from ishara_tpu.models.seq2seq import ASLTranslationModel


@pytest.fixture(scope="module")
def model_and_vars():
    model = ASLTranslationModel(
        num_classes=30, feature_dim=32, num_layers=1, num_decoder_layers=2,
        num_heads=4, dropout=0.0,
    )
    B, T = 2, 12
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T, 92, 3)).astype(np.float32))
    mask = jnp.ones((B, T), bool).at[1, 8:].set(False)
    variables = model.init(jax.random.key(0), x, mask,
                           jnp.zeros((B, 4), jnp.int32))
    return model, variables, x, mask


def test_cached_matches_full_prefix_tokens(model_and_vars):
    model, variables, x, mask = model_and_vars
    t_full, c_full = jax.jit(
        lambda v, x, m: greedy_translate(model, v, x, m, max_len=16)
    )(variables, x, mask)
    t_cached, c_cached = jax.jit(
        lambda v, x, m: greedy_translate_cached(model, v, x, m, max_len=16)
    )(variables, x, mask)
    np.testing.assert_array_equal(np.asarray(t_full), np.asarray(t_cached))
    np.testing.assert_allclose(np.asarray(c_full), np.asarray(c_cached),
                               rtol=1e-5, atol=1e-5)


def test_decode_step_logits_match_full_decode(model_and_vars):
    """Position-by-position logits parity against model.decode on a forced
    (teacher) prefix — stricter than argmax equality."""
    model, variables, x, mask = model_and_vars
    B, S = x.shape[0], 7
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 30, size=(B, S)), jnp.int32)

    memory, _ = model.apply(variables, x, mask, training=False,
                            method=model.encode)
    full = model.apply(variables, tokens, memory, mask, method=model.decode)

    cross = model.apply(variables, memory, method=model.cross_kv)
    H, Dh = model.num_heads, model.feature_dim // model.num_heads
    caches = [(jnp.zeros((B, S, H, Dh)), jnp.zeros((B, S, H, Dh)))
              for _ in range(model.num_decoder_layers)]
    step = jax.jit(lambda v, tok, pos, caches: model.apply(
        v, tok, pos, caches, cross, mask, method=model.decode_step))
    for pos in range(S):
        logits, caches = step(variables, tokens[:, pos], pos, caches)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, pos]),
            rtol=2e-4, atol=2e-4,
            err_msg=f"logits diverge at position {pos}")


def test_translation_engine_kv_cache_matches_oracle_engine():
    """End-to-end: the compiled KV-cached TranslationEngine returns the same
    tokens as the full-recompute engine on raw landmark input."""
    from ishara_tpu.serve.translation_engine import TranslationEngine

    model = ASLTranslationModel(
        num_classes=30, feature_dim=32, num_layers=1, num_decoder_layers=2,
        num_heads=4, dropout=0.0,
    )
    T = 16
    x0 = jnp.zeros((1, T, 92, 3), jnp.float32)
    m0 = jnp.ones((1, T), bool)
    variables = model.init(jax.random.key(2), x0, m0,
                           jnp.zeros((1, 4), jnp.int32))

    raw = np.random.default_rng(3).standard_normal((40, 276)).astype(
        np.float32)
    kw = dict(frame_len=T, max_raw_frames=64, max_out=12)
    eng_c = TranslationEngine(model, variables, kv_cache=True, **kw)
    eng_o = TranslationEngine(model, variables, kv_cache=False, **kw)
    ids_c, conf_c = eng_c(raw)
    ids_o, conf_o = eng_o(raw)
    np.testing.assert_array_equal(ids_c, ids_o)
    assert abs(conf_c - conf_o) < 1e-4


def test_beam_width1_equals_greedy(model_and_vars):
    """Pure-logprob beam with W=1 must reproduce the greedy decode."""
    from ishara_tpu.decode.autoregressive import beam_translate_cached

    model, variables, x, mask = model_and_vars
    x1, m1 = x[:1], mask[:1]
    t_g, c_g = jax.jit(
        lambda v, x, m: greedy_translate_cached(model, v, x, m, max_len=16)
    )(variables, x1, m1)
    t_b, c_b, score = jax.jit(
        lambda v, x, m: beam_translate_cached(model, v, x, m, max_len=16,
                                              beam_width=1)
    )(variables, x1, m1)
    np.testing.assert_array_equal(np.asarray(t_g), np.asarray(t_b))
    assert np.isfinite(float(score))


def test_beam_score_at_least_greedy(model_and_vars):
    """A W=4 beam's best score >= the greedy path's log-prob (greedy is one
    of the candidate paths the beam can keep)."""
    from ishara_tpu.decode.autoregressive import beam_translate_cached

    model, variables, x, mask = model_and_vars
    x1, m1 = x[:1], mask[:1]
    _, _, s1 = jax.jit(
        lambda v, x, m: beam_translate_cached(model, v, x, m, max_len=16,
                                              beam_width=1)
    )(variables, x1, m1)
    _, _, s4 = jax.jit(
        lambda v, x, m: beam_translate_cached(model, v, x, m, max_len=16,
                                              beam_width=4)
    )(variables, x1, m1)
    assert float(s4) >= float(s1) - 1e-5, (float(s4), float(s1))


def test_translation_engine_beam_mode():
    from ishara_tpu.serve.translation_engine import TranslationEngine

    model = ASLTranslationModel(
        num_classes=30, feature_dim=32, num_layers=1, num_decoder_layers=1,
        num_heads=4, dropout=0.0,
    )
    T = 16
    variables = model.init(jax.random.key(2), jnp.zeros((1, T, 92, 3)),
                           jnp.ones((1, T), bool),
                           jnp.zeros((1, 4), jnp.int32))
    raw = np.random.default_rng(3).standard_normal((40, 276)).astype(
        np.float32)
    eng = TranslationEngine(model, variables, frame_len=T, max_raw_frames=64,
                            max_out=12, decode="beam", beam_width=4)
    ids, conf = eng(raw)
    assert ids.shape == (12,)
    assert np.isfinite(conf)
    with pytest.raises(ValueError):
        TranslationEngine(model, variables, decode="beam", kv_cache=False)


def test_batched_engine_matches_batch1(model_and_vars):
    """BatchedTranslationEngine (one batched while_loop decode with EOS
    early-exit) must produce the same tokens as B calls of the batch-1
    TranslationEngine."""
    from ishara_tpu.serve import BatchedTranslationEngine, TranslationEngine

    model, variables, _, _ = model_and_vars
    rng = np.random.default_rng(2)
    raws = [rng.standard_normal((t, 276)).astype(np.float32)
            for t in (20, 33)]
    single = TranslationEngine(model, variables, frame_len=16,
                               max_raw_frames=48, max_out=12)
    batched = BatchedTranslationEngine(model, variables, batch_size=2,
                                       frame_len=16, max_raw_frames=48,
                                       max_out=12)
    toks_b, conf_b = batched(raws)
    for i, raw in enumerate(raws):
        toks_1, conf_1 = single(raw)
        np.testing.assert_array_equal(toks_b[i], np.asarray(toks_1))
        np.testing.assert_allclose(conf_b[i], conf_1, rtol=1e-5, atol=1e-5)
