"""Greedy CTC decoding inside XLA with fixed shapes.

The reference ``decode_phrase`` (nb cell 8) collapses repeats with a
data-dependent boolean mask — impossible under jit. Here the collapse is a
fixed-shape compaction: keep positions whose argmax differs from the previous
frame and isn't blank, then stable-sort kept ids to the front and truncate to
``max_len``. One XLA program, batch-friendly, feeds the serving executable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.landmarks import MAX_PHRASE_LENGTH
from ..data.vocab import PAD_TOKEN_IDX


def greedy_decode(
    logits: jnp.ndarray,
    blank_id: int = PAD_TOKEN_IDX,
    max_len: int = MAX_PHRASE_LENGTH,
    length: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[T, C] logits -> (ids [max_len] padded with blank, count).

    Matches the reference collapse semantics exactly: keep index i where
    x[i] != x[i+1] (the last frame of each run — note the reference's final
    run is never kept, since ``diff`` has no entry for the last frame), then
    drop blanks.
    """
    T = logits.shape[0]
    x = jnp.argmax(logits, axis=-1)
    # successor of the last frame is itself -> final run dropped (reference
    # quirk: adjacent_indices ⊆ [0, T-2])
    nxt = jnp.concatenate([x[1:], x[-1:]])
    if length is not None:
        # crop parity: frames past `length` behave as if absent — the frame
        # at length-1 is the "last frame" whose run the reference drops
        x = jnp.where(jnp.arange(T) < length, x, blank_id)
        nxt = jnp.where(jnp.arange(T) >= length - 1, x, nxt)
    keep = (x != nxt) & (x != blank_id)

    # Compact kept ids to the front, preserving order.
    dropped = jnp.logical_not(keep)
    order = jnp.argsort(dropped, stable=True)
    ids = jnp.where(jnp.sort(dropped, stable=True), blank_id, x[order])
    count = jnp.minimum(jnp.sum(keep), max_len)
    if T >= max_len:
        ids = ids[:max_len]
    else:
        ids = jnp.pad(ids, (0, max_len - T), constant_values=blank_id)
    return ids, count


def greedy_decode_batch(
    logits: jnp.ndarray,
    blank_id: int = PAD_TOKEN_IDX,
    max_len: int = MAX_PHRASE_LENGTH,
    lengths: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, C] -> (ids [B, max_len], counts [B])."""
    if lengths is None:
        return jax.vmap(lambda l: greedy_decode(l, blank_id, max_len))(logits)
    return jax.vmap(lambda l, n: greedy_decode(l, blank_id, max_len, n))(
        logits, lengths
    )
