"""Greedy autoregressive decoding for the encoder-decoder model.

Encoder runs once; the decoder is re-applied over the growing prefix inside a
`lax.fori_loop` (S<=64, 2 layers — recompute is cheaper than threading a KV
cache through flax here, and the whole loop jits into one program). The
reference has no generation loop at all: its validate() argmaxes encoder
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
