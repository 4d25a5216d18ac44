"""CTC prefix beam search on device.

The host beam search (:mod:`ishara_tpu.decode.beam`) pulls logits off-chip;
this is the statically-shaped formulation that fuses into the serving
executable: beams are padded id buffers ``[W, U]`` with (blank, non-blank)
log-mass, one `lax.scan` step per frame does

  expand (W beams x (K top symbols + blank + repeat) candidates)
  -> merge equal prefixes (pairwise-equality mask + masked logsumexp)
  -> top-W re-select,

all fixed shape. With K >= the symbol count this is exact prefix search;
smaller K is the standard emission-pruning approximation. Candidate counts
are tiny (W*(K+2) <= a few hundred), so the O(C^2 U) merge matrix is noise
on a TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..data.landmarks import MAX_PHRASE_LENGTH
from ..data.vocab import PAD_TOKEN_IDX

NEG = -1e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    both = m <= NEG
    m_safe = jnp.where(both, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    return jnp.where(both, NEG, m_safe + jnp.log(jnp.where(both, 1.0, s)))


def _merge_logsumexp(scores, eq):
    """scores [C], eq [C, C] boolean equality -> per-group logsumexp placed
    at every member (groups read their total)."""
    s = jnp.where(eq, scores[None, :], NEG)  # [C, C] row i: members of i
    m = jnp.max(s, axis=1, keepdims=True)
    m_safe = jnp.where(m <= NEG, 0.0, m)
    out = m_safe[:, 0] + jnp.log(jnp.sum(jnp.exp(s - m_safe), axis=1))
    return jnp.where(m[:, 0] <= NEG, NEG, out)


@partial(jax.jit, static_argnames=("beam_width", "top_k", "max_len",
                                   "blank_id"))
def beam_search_device(
    log_probs: jnp.ndarray,
    length: jnp.ndarray | None = None,
    beam_width: int = 8,
    top_k: int = 8,
    max_len: int = MAX_PHRASE_LENGTH,
    blank_id: int = PAD_TOKEN_IDX,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[T, C] log-probs -> (ids [max_len] of best beam, count, log_prob)."""
    T, C = log_probs.shape
    W, K = beam_width, top_k
    NCAND = W * (K + 2)
    U = max_len

    if length is None:
        length = jnp.int32(T)

    # beam state
    ids0 = jnp.full((W, U), blank_id, jnp.int32)
    len0 = jnp.zeros((W,), jnp.int32)
    pb0 = jnp.full((W,), NEG).at[0].set(0.0)   # only beam 0 alive initially
    pnb0 = jnp.full((W,), NEG)

    def step(carry, inputs):
        ids, lens, pb, pnb, t = carry
        lp = inputs  # [C]
        active = t < length

        top_val, top_idx = jax.lax.top_k(lp, K)   # may include blank; fine
        total = _logaddexp(pb, pnb)               # [W]
        last = jnp.where(
            lens > 0,
            jnp.take_along_axis(
                ids, jnp.maximum(lens - 1, 0)[:, None], axis=1)[:, 0],
            -1,
        )

        # --- candidate generation -------------------------------------
        # slot layout per beam: [K extension candidates] + [blank] + [repeat]
        def per_beam(w_ids, w_len, w_pb, w_pnb, w_total, w_last):
            # extensions with the K top symbols
            sym = top_idx                                       # [K]
            is_blank = sym == blank_id
            is_rep = sym == w_last
            # mass entering the *extended* prefix
            ext_mass = jnp.where(is_rep, w_pb, w_total) + top_val
            ext_mass = jnp.where(is_blank | (w_len >= U), NEG, ext_mass)
            ext_ids = jnp.broadcast_to(w_ids, (K, U))
            ext_ids = jax.vmap(
                lambda row, s: row.at[jnp.minimum(w_len, U - 1)].set(s)
            )(ext_ids, sym)
            ext_len = jnp.where(ext_mass <= NEG, w_len,
                                jnp.minimum(w_len + 1, U))
            ext_pb = jnp.full((K,), NEG)
            ext_pnb = ext_mass

            # same prefix via blank
            bl_ids = w_ids[None]
            bl_len = w_len[None]
            bl_pb = (w_total + lp[blank_id])[None]
            bl_pnb = jnp.full((1,), NEG)

            # same prefix via repeated last symbol (non-blank mass only)
            rep_lp = jnp.where(w_last >= 0, lp[jnp.maximum(w_last, 0)], NEG)
            rp_ids = w_ids[None]
            rp_len = w_len[None]
            rp_pb = jnp.full((1,), NEG)
            rp_pnb = (w_pnb + rep_lp)[None]

            return (
                jnp.concatenate([ext_ids, bl_ids, rp_ids], 0),
                jnp.concatenate([ext_len, bl_len, rp_len], 0),
                jnp.concatenate([ext_pb, bl_pb, rp_pb], 0),
                jnp.concatenate([ext_pnb, bl_pnb, rp_pnb], 0),
            )

        c_ids, c_len, c_pb, c_pnb = jax.vmap(per_beam)(
            ids, lens, pb, pnb, total, last)
        c_ids = c_ids.reshape(NCAND, U)
        c_len = c_len.reshape(NCAND)
        c_pb = c_pb.reshape(NCAND)
        c_pnb = c_pnb.reshape(NCAND)

        # dead candidates
        alive = _logaddexp(c_pb, c_pnb) > NEG

        # --- merge identical prefixes ---------------------------------
        same_len = c_len[:, None] == c_len[None, :]
        # compare only the first len positions (tail is blank-padded anyway)
        eq_ids = jnp.all(c_ids[:, None, :] == c_ids[None, :, :], axis=-1)
        eq = same_len & eq_ids & alive[:, None] & alive[None, :]
        m_pb = _merge_logsumexp(c_pb, eq)
        m_pnb = _merge_logsumexp(c_pnb, eq)
        # keep only the first member of each group — and kill the mass on
        # the duplicates, or top_k padding (when alive prefixes < W) can
        # re-admit a copy carrying the full merged mass and double-count it
        # on every subsequent frame
        first = jnp.argmax(eq, axis=1) == jnp.arange(NCAND)
        keep = first & alive
        m_pb = jnp.where(keep, m_pb, NEG)
        m_pnb = jnp.where(keep, m_pnb, NEG)
        score = jnp.where(keep, _logaddexp(m_pb, m_pnb), NEG)

        # --- top-W reselect -------------------------------------------
        _, sel = jax.lax.top_k(score, W)
        new = (c_ids[sel], c_len[sel], m_pb[sel], m_pnb[sel])

        # freeze once past the sequence length
        out = tuple(
            jnp.where(active, n, o)
            for n, o in zip(new, (ids, lens, pb, pnb))
        )
        return (*out, t + 1), None

    (ids, lens, pb, pnb, _), _ = jax.lax.scan(
        step, (ids0, len0, pb0, pnb0, jnp.int32(0)), log_probs)
    best = jnp.argmax(_logaddexp(pb, pnb))
    return ids[best], lens[best], _logaddexp(pb, pnb)[best]


def beam_decode_device_batch(logits, lengths=None, **kw):
    """[B, T, C] logits -> (ids [B, max_len], counts [B])."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if lengths is None:
        f = jax.vmap(lambda l: beam_search_device(l, **kw)[:2])
        return f(lp)
    f = jax.vmap(lambda l, n: beam_search_device(l, n, **kw)[:2])
    return f(lp, lengths)
