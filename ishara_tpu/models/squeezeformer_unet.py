"""Speech-style Squeezeformer with Temporal U-Net — the working rebuild of
the reference's vendored ``squeezeformer/`` package (941 LoC, broken import
chain — SURVEY.md §2.1), in JAX.

Components and their reference counterparts:

* :class:`RelativeMultiHeadAttention` — Transformer-XL relative MHA with
  u/v content/position biases and the relative-shift trick
  (``squeezeformer/attention.py:25-110``);
* :class:`DepthwiseConv2dSubsampling` — 2x (conv stride 2) time/4 frontend
  (``squeezeformer/convolution.py:39-73``);
* :class:`TimeReductionLayer` / ``recover_resolution`` — the Temporal U-Net:
  halve the time axis mid-stack, recover by 2x repeat + skip add
  (``squeezeformer/convolution.py:241-269``, ``modules.py:137-142``,
  ``encoder.py:152-162``);
* :class:`SpeechSqueezeformerEncoder` / :class:`Squeezeformer` — post-LN
  block layout MHSA->LN->FFN->LN->Conv->LN->FFN->LN and the CTC head with
  log_softmax (``squeezeformer/encoder.py:208-244``, ``model.py:396-450``).

All time dims stay static (inputs padded to a multiple of 4); masks are
carried alongside and subsampled with the data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import FastDropout, LN_EPS, BN_EPS, BN_MOMENTUM


def rel_positional_encoding(T: int, dim: int) -> np.ndarray:
    """Symmetric relative positions +T-1 .. -(T-1), shape [2T-1, dim]
    (squeezeformer/modules.py:59-108)."""
    pos = np.arange(T - 1, -T, -1, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, np.float32) * -(np.log(10000.0) / dim))
    pe = np.zeros((2 * T - 1, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class RelativeMultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
        """[B, H, T, 2T-1] -> [B, H, T, T] (attention.py:102-110)."""
        B, H, T, L = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, L + 1, T)
        x = x[:, :, 1:].reshape(B, H, T, L)
        return x[..., :T]

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        B, T, _ = x.shape
        H, Dh = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(B, T, H, Dh)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(x).reshape(B, T, H, Dh)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x).reshape(B, T, H, Dh)
        pe = jnp.asarray(rel_positional_encoding(T, self.dim), self.dtype)
        p = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="pos")(pe).reshape(2 * T - 1, H, Dh)

        u = self.param("u_bias", nn.initializers.xavier_uniform(), (H, Dh))
        w = self.param("v_bias", nn.initializers.xavier_uniform(), (H, Dh))

        content = jnp.einsum("bqhd,bkhd->bhqk", q + u[None, None], k)
        pos = jnp.einsum("bqhd,lhd->bhql", q + w[None, None], p)
        score = (content + self._rel_shift(pos)) / jnp.sqrt(
            jnp.asarray(self.dim, jnp.float32))
        if mask is not None:
            score = jnp.where(mask[:, None, None, :], score,
                              jnp.finfo(score.dtype).min)
        attn = nn.softmax(score, axis=-1)
        attn = FastDropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class DepthwiseConv2dSubsampling(nn.Module):
    """Two stride-2 convs over time (x4 reduction): conv2d -> relu ->
    depthwise conv2d -> relu (convolution.py:39-73)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, T, F] treated as [B, T, F, 1] image
        h = x[..., None]
        h = nn.Conv(self.out_dim, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_dim, (3, 3), strides=(2, 2),
                    feature_group_count=self.out_dim, dtype=self.dtype,
                    name="dwconv")(h)
        h = nn.relu(h)
        B, T4, F4, C = h.shape
        return h.reshape(B, T4, F4 * C)


class TimeReductionLayer(nn.Module):
    """Depthwise conv stride 2 halving the time axis (convolution.py:241-269)."""

    dim: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        return nn.Conv(self.dim, (self.kernel_size,), strides=(2,),
                       padding="SAME", feature_group_count=np.gcd(C, self.dim),
                       dtype=self.dtype, name="dw")(x)


def recover_resolution(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """2x repeat upsample then crop (modules.py:137-142)."""
    up = jnp.repeat(x, 2, axis=1)
    return up[:, :target_len]


class _PostLNBlock(nn.Module):
    """MHSA -> LN -> FFN -> LN -> Conv -> LN -> FFN -> LN with post-norm
    residuals (encoder.py:208-244)."""

    dim: int
    num_heads: int
    kernel_size: int = 31
    expansion: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        det = not training

        def ffn(tag, h):
            h = nn.Dense(self.dim * self.expansion, dtype=self.dtype,
                         name=f"{tag}_fc1")(h)
            h = nn.swish(h)
            h = FastDropout(self.dropout)(h, deterministic=det)
            return nn.Dense(self.dim, dtype=self.dtype, name=f"{tag}_fc2")(h)

        h = RelativeMultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                       dtype=self.dtype, name="mhsa")(
            x, mask=mask, deterministic=det)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln1")(x + h)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln2")(x + ffn("ffn1", x))

        # conv module: pw(2d)+GLU -> dw k -> BN -> swish -> pw
        h = nn.Conv(self.dim * 2, (1,), dtype=self.dtype, name="pw1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)
        h = nn.Conv(self.dim, (self.kernel_size,), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dw")(h)
        h = nn.BatchNorm(use_running_average=not training,
                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype, name="bn")(h)
        h = nn.swish(h)
        h = nn.Conv(self.dim, (1,), dtype=self.dtype, name="pw2")(h)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln3")(x + h)
        return nn.LayerNorm(epsilon=LN_EPS, name="ln4")(x + ffn("ffn2", x))


class SpeechSqueezeformerEncoder(nn.Module):
    """Block stack with time reduction at ``reduce_idx`` and recovery (+skip)
    at ``recover_idx`` (encoder.py:152-162)."""

    dim: int = 144
    num_layers: int = 8
    num_heads: int = 4
    kernel_size: int = 31
    reduce_idx: int = 3
    recover_idx: int = 6
    dropout: float = 0.1
    subsample: bool = False
    input_dim: int = 276
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        if self.subsample:
            x = DepthwiseConv2dSubsampling(self.dim, dtype=self.dtype,
                                           name="subsample")(x)
            if mask is not None:
                mask = mask[:, ::2][:, ::2]
        x = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(x)

        skip, premask = None, mask
        full_len = x.shape[1]
        for i in range(self.num_layers):
            if i == self.reduce_idx:
                skip = x
                x = TimeReductionLayer(self.dim, dtype=self.dtype,
                                       name="time_reduce")(x)
                if mask is not None:
                    mask = mask[:, ::2]
            if i == self.recover_idx and skip is not None:
                x = recover_resolution(x, full_len)
                x = nn.Dense(self.dim, dtype=self.dtype, name="recover_proj")(x)
                x = x + skip
                mask = premask
            x = _PostLNBlock(self.dim, self.num_heads, self.kernel_size,
                             dropout=self.dropout, dtype=self.dtype,
                             name=f"block_{i}")(x, mask=mask,
                                                training=training)
        return x


class Squeezeformer(nn.Module):
    """Top-level CTC model: encoder + biasless Linear + log_softmax
    (model.py:447-450)."""

    num_classes: int = 60
    dim: int = 144
    num_layers: int = 8
    num_heads: int = 4
    reduce_idx: int = 3
    recover_idx: int = 6
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        enc = SpeechSqueezeformerEncoder(
            self.dim, self.num_layers, self.num_heads,
            reduce_idx=self.reduce_idx, recover_idx=self.recover_idx,
            dropout=self.dropout, dtype=self.dtype, name="encoder",
        )(x, mask=mask, training=training)
        logits = nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype,
                          name="fc")(enc)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
