"""Greedy autoregressive decoding for the encoder-decoder model.

Two implementations over the same parameters:

* :func:`greedy_translate` — re-applies the decoder over the growing prefix
  each step (O(S^2) recompute; the simple oracle).
* :func:`greedy_translate_cached` — the serving path: cross-attention K/V
  computed once, per-layer self-attention K/V carried through a
  ``lax.fori_loop`` (O(S) decoder work; parity-tested against the oracle in
  tests/test_kv_decode.py).

The reference has no generation loop at all: its validate() argmaxes encoder
states (integration.py:819-827); this provides the real seq2seq decode the
torch path implies plus that cheap validation mode via ``tgt=None``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy_translate(
    model, variables, x, mask=None, max_len: int = 64,
    sos: int = 1, eos: int = 2, pad: int = 0,
):
    """x [B, T, 92, 3] -> token ids [B, max_len] (starts with sos)."""
    memory, confidence = model.apply(
        variables, x, mask, training=False, method=model.encode
    )
    B = x.shape[0]
    tokens = jnp.full((B, max_len), pad, jnp.int32).at[:, 0].set(sos)
    finished = jnp.zeros((B,), bool)

    def body(s, carry):
        tokens, finished = carry
        logits = model.apply(
            variables, tokens, memory, mask, training=False,
            method=model.decode,
        )  # [B, max_len, C] — positions >= s are garbage but unused
        nxt = jnp.argmax(logits[:, s - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, pad, nxt)
        tokens = tokens.at[:, s].set(nxt)
        finished = finished | (nxt == eos)
        return tokens, finished

    tokens, _ = jax.lax.fori_loop(1, max_len, body, (tokens, finished))
    return tokens, confidence


def greedy_translate_cached(
    model, variables, x, mask=None, max_len: int = 64,
    sos: int = 1, eos: int = 2, pad: int = 0,
):
    """KV-cached greedy decode; same contract as :func:`greedy_translate`."""
    memory, confidence = model.apply(
        variables, x, mask, training=False, method=model.encode
    )
    cross = model.apply(variables, memory, method=model.cross_kv)
    B = x.shape[0]
    H = model.num_heads
    Dh = model.feature_dim // H
    dt = memory.dtype
    caches = [
        (jnp.zeros((B, max_len, H, Dh), dt), jnp.zeros((B, max_len, H, Dh), dt))
        for _ in range(model.num_decoder_layers)
    ]
    tokens = jnp.full((B, max_len), pad, jnp.int32).at[:, 0].set(sos)
    finished = jnp.zeros((B,), bool)

    def body(s, carry):
        tokens, finished, caches = carry
        prev = jax.lax.dynamic_slice_in_dim(tokens, s - 1, 1, axis=1)[:, 0]
        logits, caches = model.apply(
            variables, prev, s - 1, caches, cross, mask,
            method=model.decode_step,
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, pad, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], s, axis=1)
        finished = finished | (nxt == eos)
        return tokens, finished, caches

    tokens, _, _ = jax.lax.fori_loop(
        1, max_len, body, (tokens, finished, caches))
    return tokens, confidence
