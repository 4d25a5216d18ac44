"""Batched edit distance on device.

The reference computes confidence targets by greedy-decoding every training
batch, shipping it to the host, and running python-Levenshtein per sample
(integration.py:736-745) — a per-step host sync. This implements the DP fully
on device with fixed shapes: a `lax.scan` over rows where the in-row
left-dependency ``cur[j-1]+1`` is resolved with a min-plus prefix scan
(``cur[j] = min_k<=j (m[k] - k) + j``), i.e. `associative_scan` — O(log M)
depth per row instead of a sequential inner loop. vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def edit_distance(
    a: jnp.ndarray, b: jnp.ndarray,
    len_a: jnp.ndarray, len_b: jnp.ndarray,
) -> jnp.ndarray:
    """Levenshtein distance between ``a[:len_a]`` and ``b[:len_b]``.

    ``a``: [N] int ids, ``b``: [M] int ids; returns scalar int32.
    """
    M = b.shape[0]
    j = jnp.arange(M + 1)

    def step(prev, inp):
        ai, i = inp
        cost = (ai != b).astype(jnp.int32)
        # candidates not depending on cur[j-1]: delete (prev[j]+1) and
        # substitute (prev[j-1]+cost) for j>=1; boundary dp[i+1][0]=i+1
        m = jnp.minimum(prev[1:] + 1, prev[:-1] + cost)
        full = jnp.concatenate([jnp.array([i + 1], jnp.int32), m])
        run = jax.lax.associative_scan(jnp.minimum, full - j)
        cur = run + j
        # freeze rows past len_a
        cur = jnp.where(i < len_a, cur, prev)
        return cur, None

    last, _ = jax.lax.scan(
        step, jnp.arange(M + 1, dtype=jnp.int32),
        (a.astype(jnp.int32), jnp.arange(a.shape[0], dtype=jnp.int32)),
    )
    return last[jnp.clip(len_b, 0, M)]


def batched_edit_distance(a, b, len_a, len_b) -> jnp.ndarray:
    """vmapped :func:`edit_distance` over leading batch dim."""
    return jax.vmap(edit_distance)(a, b, len_a, len_b)


def normalized_similarity(a, b, len_a, len_b) -> jnp.ndarray:
    """1 - dist / max(len_b, 1): the reference's confidence target
    (integration.py:738-744), on device."""
    d = batched_edit_distance(a, b, len_a, len_b)
    return 1.0 - d.astype(jnp.float32) / jnp.maximum(len_b, 1).astype(jnp.float32)
