"""Stateful chunked streaming for causal encoders (live captioning).

Beyond the reference (ROADMAP #5): the reference's realtime story re-runs a
sliding window of the last N frames through the full model for every update
(``inference tests/realtime_inference_test.py``), paying O(window) compute
per new frame and re-decoding from scratch. A ``cfg.causal=True`` encoder
(causal attention + causal convs + running-mean SE gate, models/layers.py)
admits true streaming: each block carries a small state and every new frame
is processed exactly once.

Per-block state (all statically shaped, the whole step is one jitted XLA
program):

* attention  — rolling K/V caches of the last ``attn_context`` projected
  keys/values ``[W, dim]`` (frame t's K/V never changes in a causal model,
  so caching projections is exact);
* conv       — the last ``k-1`` rows of the depthwise conv's input (its
  causal left context);
* SE gate    — running sum ``[dim]`` + frame count of the conv-module
  output (the streaming form of ``causal_masked_mean``);
* stem       — the global frame position (indexes the sin/cos positional
  encoding table).

``StreamingEncoder.step`` consumes a fixed-size chunk of raw landmark
frames, normalizes them with the training GroupStats (no resampling — a
live stream has no known final length; this is the one deliberate
difference from the batch path, which resamples to ``frame_len``), runs the
encoder, and incrementally greedy-CTC-decodes. Chunk output is bit-equal to
slicing the batch causal forward at the same frames
(tests/test_streaming.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from ..data.vocab import ASLFR_CHARS
from ..models.layers import BN_EPS, LN_EPS, LN_EPS_DEFAULT, positional_encoding
from ..preprocess.pipeline import GroupStats, _flat_stats

BN_EPS_DEFAULT = 1e-3  # conformer conv-module BN (Keras default, quirk kept)


class BlockState(NamedTuple):
    k_cache: jnp.ndarray      # [W, dim]
    v_cache: jnp.ndarray      # [W, dim]
    conv_tail: jnp.ndarray    # [k-1, conv_width]
    se_sum: jnp.ndarray       # [dim] (zeros for conformer blocks)
    se_count: jnp.ndarray     # scalar f32


class StreamState(NamedTuple):
    pos: jnp.ndarray                 # scalar int32, global frame index
    blocks: tuple                    # BlockState per encoder block
    prev_id: jnp.ndarray             # scalar int32, last emitted CTC id
    # validity of the cached attention-key frames [W] (Keras Masking(0.0)
    # semantics: a frame with any nonzero feature is valid) — one vector
    # for the whole stack, since validity is a property of the input frame
    valid_cache: jnp.ndarray = jnp.zeros((0,), jnp.float32)


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _ffn(x, p):
    h = _swish(x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def _mhsa_step(h, p, st: BlockState, pos, num_heads, dim, window, valid_all):
    """h [C, dim] post-LN chunk; returns ([C, dim], new k/v caches).

    Cache row j holds the projection of global frame ``pos - W + j``
    (invalid while that is negative). Queries attend causally within the
    last ``window`` frames to VALID keys (``valid_all`` [W+C], Masking(0.0)
    semantics) — identical to the batch causal mask."""
    C = h.shape[0]
    W = st.k_cache.shape[0]
    dh = dim // num_heads
    qkv = h @ p["qkv"]["kernel"]          # [C, 3*dim]
    qkv = qkv.reshape(C, num_heads, 3 * dh)
    q = qkv[..., :dh]
    k_new = qkv[..., dh:2 * dh].reshape(C, dim)
    v_new = qkv[..., 2 * dh:].reshape(C, dim)

    k_all = jnp.concatenate([st.k_cache, k_new])   # [W+C, dim]
    v_all = jnp.concatenate([st.v_cache, v_new])
    kh = k_all.reshape(W + C, num_heads, dh)
    vh = v_all.reshape(W + C, num_heads, dh)

    gq = pos + jnp.arange(C)[:, None]              # [C, 1] global query pos
    gk = pos - W + jnp.arange(W + C)[None, :]      # [1, W+C] global key pos
    allowed = (gk <= gq) & (gk >= 0) & (gq - gk < window)
    allowed &= valid_all[None, :] > 0.5

    scale = dim ** -0.5  # reference full-dim scale quirk
    s = jnp.einsum("qhd,khd->hqk", q, kh) * scale
    s = jnp.where(allowed[None], s, jnp.finfo(s.dtype).min)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", w, vh).reshape(C, dim)
    out = o @ p["proj"]["kernel"]
    return out, k_all[C:], v_all[C:]


def _causal_dw_step(h, w, tail):
    """Depthwise causal conv over a chunk with carried left context.
    h [C, E], w [k, E], tail [k-1, E] -> ([C, E], new tail)."""
    k = w.shape[0]
    C = h.shape[0]
    full = jnp.concatenate([tail, h])              # [k-1+C, E]
    out = jnp.zeros_like(h)
    for j in range(k):
        out = out + full[j:j + C] * w[j][None, :]
    return out, full[C:]


def _squeeze_block_step(x, p, st: BlockState, pos, num_heads, dim, window,
                        valid_all, valid):
    """Streaming SqueezeformerBlock (eval): FFN1 -> MHSA -> conv(SE) -> FFN2.
    ``valid`` [C] marks real frames; only they feed the SE running mean."""
    x = x + _ffn(_ln(x, p["norm1"], LN_EPS), p["ffn1"])
    att, k_c, v_c = _mhsa_step(_ln(x, p["norm2"], LN_EPS), p["mha"], st, pos,
                               num_heads, dim, window, valid_all)
    x = x + att
    # conv module
    h = _ln(x, p["conv"]["norm"], LN_EPS)
    h = _swish(h @ p["conv"]["pw1"]["kernel"][0] + p["conv"]["pw1"]["bias"])
    h, tail = _causal_dw_step(h, p["conv"]["dw"]["dwconv"]["kernel"][:, 0, :],
                              st.conv_tail)
    h = _swish(h)
    h = h @ p["conv"]["pw2"]["kernel"][0] + p["conv"]["pw2"]["bias"]
    # running-mean SE gate (the streaming form of causal_masked_mean):
    # invalid frames contribute neither sum nor count, like the batch mask
    C = h.shape[0]
    m = valid[:, None]
    cum = st.se_sum[None, :] + jnp.cumsum(h * m, axis=0)
    cnt = st.se_count + jnp.cumsum(valid)[:, None]
    g = cum / jnp.maximum(cnt, 1.0)
    g = _swish(g @ p["conv"]["se"]["fc1"]["kernel"]
               + p["conv"]["se"]["fc1"]["bias"])
    g = jax.nn.sigmoid(g @ p["conv"]["se"]["fc2"]["kernel"]
                       + p["conv"]["se"]["fc2"]["bias"])
    x = x + h * g
    x = x + _ffn(_ln(x, p["norm3"], LN_EPS), p["ffn2"])
    new_st = BlockState(k_c, v_c, tail, cum[-1],
                        st.se_count + jnp.sum(valid))
    return x, new_st


def _conformer_block_step(x, p, bs, st: BlockState, pos, num_heads, dim,
                          window, valid_all):
    """Streaming ConformerBlock (eval): shared-ln1 FFN1/MHSA, causal GLU
    conv with BN running stats, post-LN residual, FFN2."""
    x = x + _ffn(_ln(x, p["ln1"], LN_EPS), p["ffn1"])
    att, k_c, v_c = _mhsa_step(_ln(x, p["ln1"], LN_EPS), p["mha"], st, pos,
                               num_heads, dim, window, valid_all)
    x = x + att
    res = x
    h = x @ p["conv"]["pw1"]["kernel"][0] + p["conv"]["pw1"]["bias"]
    a, b = h[:, :dim], h[:, dim:]
    h = a * jax.nn.sigmoid(b)
    h, tail = _causal_dw_step(h, p["conv"]["dw"]["kernel"][:, 0, :],
                              st.conv_tail)
    h = h + p["conv"]["dw"]["bias"]
    bn = p["conv"]["bn"]
    h = (h - bs["bn"]["mean"]) * jax.lax.rsqrt(bs["bn"]["var"]
                                               + BN_EPS_DEFAULT)
    h = h * bn["scale"] + bn["bias"]
    h = h @ p["conv"]["pw2"]["kernel"][0] + p["conv"]["pw2"]["bias"]
    x = _ln(h + res, p["conv"]["ln"], LN_EPS_DEFAULT)
    x = x + _ffn(_ln(x, p["ln2"], LN_EPS), p["ffn2"])
    new_st = BlockState(k_c, v_c, tail, st.se_sum, st.se_count)
    return x, new_st


class StreamingEncoder:
    """Chunked realtime inference over a ``cfg.causal=True`` encoder.

    >>> eng = StreamingEncoder(cfg, variables, stats, chunk_size=8)
    >>> state = eng.init_state()
    >>> collected = []
    >>> for chunk in frames.reshape(-1, 8, 276):
    ...     state, ids, n, logits = eng.step(state, chunk)
    ...     collected.append(ids)
    >>> text = eng.decode_text(StreamingEncoder.collect(collected))
    """

    def __init__(self, cfg: EncoderConfig, variables, stats: GroupStats
                 | None = None, chunk_size: int = 8,
                 max_positions: int = 2048):
        if not cfg.causal:
            raise ValueError("StreamingEncoder requires cfg.causal=True")
        if cfg.variant not in ("squeezeformer", "conformer", "hybrid"):
            raise ValueError(f"streaming unsupported for {cfg.variant!r}")
        if cfg.attn_context <= 0:
            raise ValueError("streaming needs a bounded attn_context (> 0)")
        if cfg.dominant_hand:
            # dominant-hand canonicalization picks the hand with fewer NaNs
            # over the WHOLE sequence (preprocess.dominant_hand_mirror) — a
            # live stream has no whole sequence, so a model trained with it
            # would silently see the wrong hand layout here
            raise ValueError(
                "cfg.dominant_hand models cannot stream: the mirror "
                "decision needs the full sequence; train the streaming "
                "model with dominant_hand=False (lr_flip augmentation "
                "instead)")
        self.cfg = cfg
        self.max_positions = int(max_positions)
        self.chunk_size = int(chunk_size)
        self.params = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32), variables["params"])
        self.batch_stats = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32),
            variables.get("batch_stats", {}))
        mean, std = _flat_stats(stats or GroupStats.identity())
        self._mean, self._std = mean, std
        self._pe = jnp.asarray(positional_encoding(max_positions, cfg.dim))
        self._n_squeeze = (cfg.num_squeeze_blocks
                           if cfg.variant in ("squeezeformer", "hybrid")
                           else 0)
        self._n_conform = (cfg.num_conform_blocks
                           if cfg.variant in ("conformer", "hybrid") else 0)
        self._step = jax.jit(self._step_impl)

    # -- state ------------------------------------------------------------

    def init_state(self) -> StreamState:
        cfg = self.cfg
        W = cfg.attn_context
        e = cfg.expansion_factor

        def blk(conv_width, k, se):
            return BlockState(
                k_cache=jnp.zeros((W, cfg.dim), jnp.float32),
                v_cache=jnp.zeros((W, cfg.dim), jnp.float32),
                conv_tail=jnp.zeros((k - 1, conv_width), jnp.float32),
                se_sum=jnp.zeros((cfg.dim if se else 0,), jnp.float32),
                se_count=jnp.float32(0.0),
            )

        k = cfg.transformer_kernel_size
        blocks = tuple(blk(cfg.dim * e, k, True)
                       for _ in range(self._n_squeeze))
        blocks += tuple(blk(cfg.dim, k, False)
                        for _ in range(self._n_conform))
        return StreamState(pos=jnp.int32(0), blocks=blocks,
                           prev_id=jnp.int32(self.cfg.blank_id),
                           valid_cache=jnp.zeros((W,), jnp.float32))

    # -- one chunk --------------------------------------------------------

    def _step_impl(self, state: StreamState, chunk):
        """chunk [C, 276] raw landmarks -> (state', ids [C], n_new)."""
        cfg = self.cfg
        p = self.params
        C = chunk.shape[0]

        from ..preprocess.pipeline import _OUT_PERM

        x = jnp.nan_to_num((chunk[:, _OUT_PERM] - self._mean) / self._std,
                           nan=0.0)
        # Keras Masking(0.0) semantics, like the batch path's frame_mask:
        # an all-zero frame (e.g. full tracking dropout) is not a valid
        # attention key and does not feed the SE running mean
        valid = jnp.any(x != 0.0, axis=-1).astype(jnp.float32)      # [C]
        valid_all = jnp.concatenate([state.valid_cache, valid])     # [W+C]
        # stem: Dense -> +PE[global pos] -> BN(running stats)
        x = x @ p["stem_conv"]["kernel"]
        pe = jax.lax.dynamic_slice_in_dim(self._pe, state.pos, C)
        x = x + pe
        bs = self.batch_stats["stem_bn"]
        x = (x - bs["mean"]) * jax.lax.rsqrt(bs["var"] + BN_EPS)
        x = x * p["stem_bn"]["scale"] + p["stem_bn"]["bias"]

        window = cfg.attn_context
        new_blocks = []
        bi = 0
        for i in range(self._n_squeeze):
            x, st = _squeeze_block_step(
                x, p[f"squeezeformer_{i}"], state.blocks[bi], state.pos,
                cfg.num_heads, cfg.dim, window, valid_all, valid)
            new_blocks.append(st)
            bi += 1
        for i in range(self._n_conform):
            x, st = _conformer_block_step(
                x, p[f"conformer_{i}"],
                self.batch_stats[f"conformer_{i}"]["conv"],
                state.blocks[bi], state.pos, cfg.num_heads, cfg.dim, window,
                valid_all)
            new_blocks.append(st)
            bi += 1

        x = jax.nn.relu(x @ p["top_conv"]["kernel"] + p["top_conv"]["bias"])
        logits = x @ p["classifier"]["kernel"] + p["classifier"]["bias"]

        # incremental greedy CTC collapse across the chunk boundary
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [C]
        prev = jnp.concatenate([state.prev_id[None], ids[:-1]])
        emit = (ids != prev) & (ids != cfg.blank_id)
        out_ids = jnp.where(emit, ids, -1)
        new_state = StreamState(pos=state.pos + C, blocks=tuple(new_blocks),
                                prev_id=ids[-1],
                                valid_cache=valid_all[C:])
        return new_state, out_ids, jnp.sum(emit), logits

    def step(self, state: StreamState, chunk):
        """Feed one [chunk_size, 276] block of raw frames. Returns
        (new_state, emitted_ids [C] with -1 at non-emitting frames, n_new,
        logits [C, num_classes])."""
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.shape != (self.chunk_size, self.cfg.input_dim):
            raise ValueError(f"chunk must be [{self.chunk_size}, "
                             f"{self.cfg.input_dim}], got {chunk.shape}")
        if int(state.pos) + self.chunk_size > self.max_positions:
            # the PE table would clamp and silently repeat its last rows
            raise ValueError(
                f"stream exceeds max_positions={self.max_positions}; "
                f"construct StreamingEncoder with a larger max_positions "
                f"or restart the state")
        return self._step(state, chunk)

    @staticmethod
    def collect(emitted_ids) -> list[int]:
        """Host-side helper: keep the emitting frames of step() outputs."""
        out = []
        for ids in emitted_ids:
            out.extend(int(i) for i in np.asarray(ids) if i >= 0)
        return out

    def decode_text(self, ids) -> str:
        return "".join(ASLFR_CHARS[i] for i in ids
                       if 0 <= i < len(ASLFR_CHARS))
