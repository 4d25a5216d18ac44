"""Whole-loop fused greedy-decode kernel parity (ops/decoder_kernel.py).

The kernel runs the entire autoregressive loop in one Pallas program (grid =
decode step, VMEM-resident weights, K/V caches in scratch, one-hot-matmul
embedding lookup, masked post-EOS skipping). Interpret-mode tokens must equal
``greedy_translate_cached``'s — same parameters, same inputs — so any
divergence is a cache-row, visibility-mask, head-blocking, or argmax
tie-break bug."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.decode.autoregressive import greedy_translate_cached
from ishara_tpu.models.seq2seq import ASLTranslationModel
from ishara_tpu.ops.decoder_kernel import (
    fused_greedy_decode,
    fused_greedy_translate,
)


def _build(feature_dim=32, num_heads=4, num_decoder_layers=2, T=12,
           num_classes=30, seed=0):
    model = ASLTranslationModel(
        num_classes=num_classes, feature_dim=feature_dim, num_layers=1,
        num_decoder_layers=num_decoder_layers, num_heads=num_heads,
        dropout=0.0,
    )
    x = jnp.asarray(np.random.default_rng(seed).standard_normal(
        (1, T, 92, 3)).astype(np.float32))
    mask = jnp.ones((1, T), bool).at[0, T - 3:].set(False)
    variables = model.init(jax.random.key(seed), x, mask,
                           jnp.zeros((1, 4), jnp.int32))
    return model, variables, x, mask


@pytest.mark.parametrize("layers,heads,dim", [(2, 4, 32), (1, 8, 64)])
def test_fused_decode_matches_cached(layers, heads, dim):
    model, variables, x, mask = _build(
        feature_dim=dim, num_heads=heads, num_decoder_layers=layers)
    ref, c_ref = jax.jit(
        lambda v, x, m: greedy_translate_cached(
            model, v, x, m, max_len=16, early_exit=False)
    )(variables, x, mask)
    got, c_got = jax.jit(
        lambda v, x, m: fused_greedy_translate(
            model, v, x, m, max_len=16, interpret=True)
    )(variables, x, mask)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_got),
                               rtol=1e-5, atol=1e-5)


def test_fused_decode_no_mask():
    model, variables, x, _ = _build()
    ref, _ = jax.jit(
        lambda v, x: greedy_translate_cached(
            model, v, x, None, max_len=12, early_exit=False)
    )(variables, x)
    got, _ = jax.jit(
        lambda v, x: fused_greedy_translate(
            model, v, x, None, max_len=12, interpret=True)
    )(variables, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_decode_eos_freezes_output():
    """Force an early EOS by biasing the classifier: every position after
    the first generated token must be pad, and the caches/embedding carried
    past EOS must not corrupt it (post-EOS steps are masked off)."""
    model, variables, x, mask = _build(seed=3)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    bias = np.zeros_like(
        np.asarray(variables["params"]["classifier"]["bias"]))
    bias[2] = 100.0  # eos wins every step
    variables["params"]["classifier"]["bias"] = jnp.asarray(bias)

    got, _ = jax.jit(
        lambda v, x, m: fused_greedy_translate(
            model, v, x, m, max_len=10, interpret=True)
    )(variables, x, mask)
    got = np.asarray(got)[0]
    assert got[0] == 1            # sos
    assert got[1] == 2            # immediate eos
    np.testing.assert_array_equal(got[2:], np.zeros(8, np.int32))


def test_fused_decode_from_memory_contract():
    """fused_greedy_decode consumes a precomputed memory (the engine calls
    encode once and reuses it)."""
    model, variables, x, mask = _build()
    memory, _ = model.apply(variables, x, mask, training=False,
                            method=model.encode)
    ref, _ = greedy_translate_cached(model, variables, x, mask, max_len=12,
                                     early_exit=False)
    got = fused_greedy_decode(model, variables, memory, mask, max_len=12,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


# --- whole-loop fused beam search -----------------------------------------

from ishara_tpu.decode.autoregressive import beam_translate_cached  # noqa: E402
from ishara_tpu.ops.decoder_kernel import fused_beam_translate  # noqa: E402


@pytest.mark.parametrize("width,penalty", [(4, 0.0), (3, 0.6), (1, 0.0)])
def test_fused_beam_matches_cached(width, penalty):
    model, variables, x, mask = _build(seed=5)
    t_ref, c_ref, s_ref = jax.jit(
        lambda v, x, m: beam_translate_cached(
            model, v, x, m, max_len=16, beam_width=width,
            length_penalty=penalty)
    )(variables, x, mask)
    t_got, c_got, s_got = jax.jit(
        lambda v, x, m: fused_beam_translate(
            model, v, x, m, max_len=16, beam_width=width,
            length_penalty=penalty, interpret=True)
    )(variables, x, mask)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_got))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_got),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_got),
                               rtol=1e-5, atol=1e-5)


def test_fused_beam_width1_equals_fused_greedy():
    model, variables, x, mask = _build(seed=9)
    t_beam, _, _ = fused_beam_translate(
        model, variables, x, mask, max_len=12, beam_width=1, interpret=True)
    t_greedy, _ = fused_greedy_translate(
        model, variables, x, mask, max_len=12, interpret=True)
    np.testing.assert_array_equal(np.asarray(t_beam), np.asarray(t_greedy))


def test_fused_beam_eos_stops_all():
    """Classifier biased to eos: every beam finishes at step 1; outputs are
    sos, eos, pads on the best beam."""
    model, variables, x, mask = _build(seed=3)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    bias = np.zeros_like(
        np.asarray(variables["params"]["classifier"]["bias"]))
    bias[2] = 100.0
    variables["params"]["classifier"]["bias"] = jnp.asarray(bias)
    got, _, _ = fused_beam_translate(
        model, variables, x, mask, max_len=10, beam_width=4, interpret=True)
    got = np.asarray(got)[0]
    assert got[0] == 1 and got[1] == 2
    np.testing.assert_array_equal(got[2:], np.zeros(8, np.int32))


# ---------------------------------------------------------------------------
# VMEM-budget guard (VERDICT r4 #3): geometries whose kernel VMEM need
# exceeds the budget must degrade to the XLA while_loop path — with token
# parity — instead of dying in a Mosaic scoped-VMEM compile error.
# ---------------------------------------------------------------------------

from ishara_tpu.decode.autoregressive import beam_translate_cached  # noqa: E402
from ishara_tpu.ops.decoder_kernel import (  # noqa: E402
    DecoderVmemError,
    fused_beam_translate,
    fused_decode_fits,
    fused_decode_vmem_bytes,
)


def test_vmem_bytes_formula_scales():
    # flagship translation geometry: low single-digit MiB, fits the budget
    flagship = fused_decode_vmem_bytes(208, 8, 2, 62, 176, 64)
    assert 2 * 2**20 < flagship < 16 * 2**20
    # beam multiplies the cache banks, not the weights
    beam = fused_decode_vmem_bytes(208, 8, 2, 62, 176, 64, W=4)
    assert flagship < beam < 4 * flagship
    # a big decoder blows past any plausible budget (dim=1024, L=6, T=2048)
    big = fused_decode_vmem_bytes(1024, 16, 6, 62, 2048, 512, W=8)
    assert big > 512 * 2**20


def test_fused_decode_raises_over_budget(monkeypatch):
    monkeypatch.setenv("ISHARA_DECODE_VMEM_BUDGET", str(64 * 2**10))
    model, variables, x, mask = _build()
    memory, _ = model.apply(variables, x, mask, training=False,
                            method=model.encode)
    with pytest.raises(DecoderVmemError):
        fused_greedy_decode(model, variables, memory, mask, max_len=16,
                            interpret=True)


def test_guard_fallback_greedy_token_parity(monkeypatch, caplog):
    import logging

    monkeypatch.setenv("ISHARA_DECODE_VMEM_BUDGET", str(64 * 2**10))
    model, variables, x, mask = _build()
    assert not fused_decode_fits(model, x.shape[1], 16)
    with caplog.at_level(logging.WARNING,
                         logger="ishara_tpu.ops.decoder_kernel"):
        got, c_got = fused_greedy_translate(model, variables, x, mask,
                                            max_len=16, interpret=True)
    assert any("falling back" in r.message for r in caplog.records)
    ref, c_ref = greedy_translate_cached(model, variables, x, mask,
                                         max_len=16)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_got),
                               rtol=1e-5, atol=1e-5)


def test_guard_fallback_beam_token_parity(monkeypatch, caplog):
    import logging

    monkeypatch.setenv("ISHARA_DECODE_VMEM_BUDGET", str(64 * 2**10))
    model, variables, x, mask = _build()
    with caplog.at_level(logging.WARNING,
                         logger="ishara_tpu.ops.decoder_kernel"):
        got, c_got, s_got = fused_beam_translate(
            model, variables, x, mask, max_len=16, beam_width=3,
            length_penalty=0.5, interpret=True)
    assert any("falling back" in r.message for r in caplog.records)
    ref, c_ref, s_ref = beam_translate_cached(
        model, variables, x, mask, max_len=16, beam_width=3,
        length_penalty=0.5)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_got),
                               rtol=1e-5, atol=1e-5)


def test_engine_fused_auto(monkeypatch):
    from ishara_tpu.ops.selection import translation_decode_fused
    from ishara_tpu.serve.translation_engine import TranslationEngine

    # the measured anchor says fused wins at the flagship geometry
    assert translation_decode_fused(208, 176)
    model, variables, x, mask = _build()
    # tiny geometry fits the budget -> auto resolves to the fused kernel;
    # the engine compiles and serves (interpret mode rides _on_tpu=False)
    eng = TranslationEngine(model, variables, frame_len=x.shape[1],
                            max_raw_frames=32, max_out=16, fused="auto")
    raw = np.zeros((20, 276), np.float32)
    toks, conf = eng(raw)
    assert toks.shape == (16,)
    # with a tiny budget, auto degrades to the XLA path (still serves)
    monkeypatch.setenv("ISHARA_DECODE_VMEM_BUDGET", str(64 * 2**10))
    eng2 = TranslationEngine(model, variables, frame_len=x.shape[1],
                             max_raw_frames=32, max_out=16, fused="auto")
    toks2, _ = eng2(raw)
    assert toks2.shape == (16,)
