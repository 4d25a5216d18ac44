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
    sos: int = 1, eos: int = 2, pad: int = 0, early_exit: bool = True,
):
    """KV-cached greedy decode; same contract as :func:`greedy_translate`.
    ``early_exit=False`` always runs all max_len steps (fixed-cost mode for
    benchmarking/batching experiments); the output is identical."""
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

    # EOS early-exit: a while_loop instead of a fixed fori_loop over
    # max_len — once every sequence has emitted eos the loop stops, so a
    # typical short phrase pays ~len(phrase) decoder steps, not 64.
    # Identical output (post-finish steps only appended pad, which the
    # buffer is already filled with); shapes stay static.
    def cond(carry):
        s, _, finished, _ = carry
        live = jnp.logical_not(jnp.all(finished)) if early_exit else True
        return (s < max_len) & live

    def body(carry):
        s, tokens, finished, caches = carry
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
        return s + 1, tokens, finished, caches

    _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tokens, finished, caches))
    return tokens, confidence


def beam_translate_cached(
    model, variables, x, mask=None, max_len: int = 64,
    beam_width: int = 4, sos: int = 1, eos: int = 2, pad: int = 0,
    length_penalty: float = 0.0,
):
    """KV-cached beam search over the decoder, single sequence (x [1, T,
    92, 3]). Beams ride the batch axis of :meth:`decode_step`; per-step the
    W*C continuations are pruned to the top W, with parent-reordered
    caches. ``length_penalty`` alpha divides final scores by len^alpha
    (0 = pure log-prob, at which beam_width=1 == greedy decode —
    tests/test_kv_decode.py). Returns (tokens [1, max_len], confidence,
    score)."""
    if x.shape[0] != 1:
        raise ValueError("beam decode serves one sequence at a time")
    W, C = beam_width, model.num_classes
    memory, confidence = model.apply(
        variables, x, mask, training=False, method=model.encode
    )
    mem_w = jnp.broadcast_to(memory, (W,) + memory.shape[1:])
    cross = model.apply(variables, mem_w, method=model.cross_kv)
    mask_w = (jnp.broadcast_to(mask, (W, mask.shape[1]))
              if mask is not None else None)
    H = model.num_heads
    Dh = model.feature_dim // H
    dt = memory.dtype
    caches = [
        (jnp.zeros((W, max_len, H, Dh), dt), jnp.zeros((W, max_len, H, Dh), dt))
        for _ in range(model.num_decoder_layers)
    ]
    tokens = jnp.full((W, max_len), pad, jnp.int32).at[:, 0].set(sos)
    # only beam 0 is live at step 1 (all beams start identically)
    scores = jnp.full((W,), -jnp.inf, jnp.float32).at[0].set(0.0)
    finished = jnp.zeros((W,), bool)

    # EOS early-exit (see greedy_translate_cached): stop as soon as every
    # beam is finished — finished beams only extend with cost-0 pads, so
    # the result is identical to running all max_len steps
    def cond(carry):
        s, _, _, finished, _ = carry
        return (s < max_len) & jnp.logical_not(jnp.all(finished))

    def body(carry):
        s, tokens, scores, finished, caches = carry
        prev = jax.lax.dynamic_slice_in_dim(tokens, s - 1, 1, axis=1)[:, 0]
        logits, caches = model.apply(
            variables, prev, s - 1, caches, cross, mask_w,
            method=model.decode_step,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # finished beams extend only with pad, at no cost
        fin_row = jnp.full((C,), -jnp.inf).at[pad].set(0.0)
        logp = jnp.where(finished[:, None], fin_row[None], logp)
        total = scores[:, None] + logp                  # [W, C]
        top, idx = jax.lax.top_k(total.reshape(-1), W)  # over W*C
        parent, tok = idx // C, (idx % C).astype(jnp.int32)
        tokens = tokens[parent]
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, tok[:, None], s, axis=1)
        caches = [(k[parent], v[parent]) for k, v in caches]
        finished = finished[parent] | (tok == eos)
        return s + 1, tokens, top, finished, caches

    _, tokens, scores, finished, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tokens, scores, finished, caches))
    if length_penalty > 0.0:
        # count generated tokens only: position 0 is always sos (neither pad
        # nor eos), so it is excluded from the per-beam length
        gen = tokens[:, 1:]
        lengths = jnp.sum((gen != pad) & (gen != eos), axis=1)
        scores = scores / jnp.maximum(lengths, 1).astype(
            jnp.float32) ** length_penalty
    best = jnp.argmax(scores)
    return tokens[best][None], confidence, scores[best]
