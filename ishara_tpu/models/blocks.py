"""Encoder blocks: Conv1DBlock (MBConv-style), Squeezeformer, Conformer,
Transformer — flax.linen ports of the reference Keras blocks (nb cell 5),
composed into ``get_model`` variants in :mod:`ishara_tpu.models.encoder`.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BN_EPS,
    BN_MOMENTUM,
    LN_EPS,
    CausalDWConv1D,
    ECA,
    FastDropoutAdd,
    FusedFFN,
    ConformerConvModule,
    MultiHeadSelfAttention,
    RowDropout,
    SqueezeformerConvModule,
)


class Conv1DBlock(nn.Module):
    """Efficient MBConv-style conv block (reference ``Conv1DBlock``, credited
    @hoyso48): Dense expand (swish) -> causal DW conv -> BN -> ECA -> Dense
    project -> row dropout -> skip add when channels match."""

    channels: int
    kernel_size: int
    dilation_rate: int = 1
    drop_rate: float = 0.0
    expand_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        channels_in = x.shape[-1]
        skip = x
        x = nn.Dense(channels_in * self.expand_ratio, dtype=self.dtype,
                     name="expand")(x)
        x = nn.swish(x)
        x = CausalDWConv1D(self.kernel_size, self.dilation_rate,
                           dtype=self.dtype, name="dw")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        x = ECA(dtype=self.dtype, name="eca")(x, mask=mask)
        x = nn.Dense(self.channels, dtype=self.dtype, name="project")(x)
        if self.drop_rate > 0:
            x = RowDropout(self.drop_rate, name="drop")(x, deterministic=not training)
        if channels_in == self.channels:
            x = x + skip
        return x


class SqueezeformerBlock(nn.Module):
    """Sandwich block: pre-LN FFN -> pre-LN MHSA -> conv module -> pre-LN FFN,
    plain residuals with shared dropout (reference ``SqueezeformerBlock``)."""

    dim: int
    num_heads: int = 8
    expansion_factor: int = 4
    kernel_size: int = 31
    dropout: float = 0.1
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32
    causal: bool = False
    attn_context: int = 0

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        det = not training
        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        x = FusedFFN(self.dim, self.expansion_factor, self.dropout,
                     res_rate=self.dropout, dtype=self.dtype,
                     name="ffn1")(res, h, deterministic=det)

        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        h = MultiHeadSelfAttention(self.dim, self.num_heads, self.dropout,
                                   dtype=self.dtype,
                                   use_flash=self.use_flash,
                                   causal=self.causal,
                                   attn_context=self.attn_context, name="mha")(
            h, mask=mask, deterministic=det)
        x = FastDropoutAdd(self.dropout)(res, h, deterministic=det)

        x = SqueezeformerConvModule(self.dim, self.kernel_size,
                                    self.expansion_factor, dtype=self.dtype,
                                    causal_se=self.causal,
                                    name="conv")(x, mask=mask,
                                                 training=training)

        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(x)
        return FusedFFN(self.dim, self.expansion_factor, self.dropout,
                        res_rate=self.dropout, dtype=self.dtype,
                        name="ffn2")(res, h, deterministic=det)


class ConformerBlock(nn.Module):
    """FFN -> MHSA -> conv module -> FFN with plain residuals.

    Keeps the reference Keras quirks: no macaron 1/2-scaling, ``layer_norm1``
    shared by the FFN1 and MHSA pre-norms, post-LN residual inside the conv
    module (nb cell 5 ``ConformerBlock``)."""

    dim: int
    num_heads: int = 8
    expand: int = 4
    kernel_size: int = 31
    attn_dropout: float = 0.1
    drop_rate: float = 0.1
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32
    causal: bool = False
    attn_context: int = 0

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        det = not training
        ln1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")
        res = x
        h = ln1(x)
        x = FusedFFN(self.dim, self.expand, self.drop_rate, res_rate=0.0,
                     dtype=self.dtype, name="ffn1")(res, h, deterministic=det)

        res = x
        h = ln1(x)
        h = MultiHeadSelfAttention(self.dim, self.num_heads, self.attn_dropout,
                                   dtype=self.dtype,
                                   use_flash=self.use_flash,
                                   causal=self.causal,
                                   attn_context=self.attn_context, name="mha")(
            h, mask=mask, deterministic=det)
        x = res + h

        x = ConformerConvModule(self.dim, self.kernel_size, dtype=self.dtype,
                                causal=self.causal,
                                name="conv")(x, training=training)

        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")(x)
        return FusedFFN(self.dim, self.expand, self.drop_rate, res_rate=0.0,
                        dtype=self.dtype, name="ffn2")(res, h,
                                                       deterministic=det)


class TransformerBlock(nn.Module):
    """Pre-LN MHSA + pre-LN biasless FFN with row dropout (reference
    ``TransformerBlock``, used by the conv-conformer family)."""

    dim: int = 256
    num_heads: int = 6
    expand: int = 4
    attn_dropout: float = 0.2
    drop_rate: float = 0.2
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        det = not training
        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")(x)
        h = MultiHeadSelfAttention(self.dim, self.num_heads, self.attn_dropout,
                                   dtype=self.dtype,
                                   use_flash=self.use_flash, name="mha")(
            h, mask=mask, deterministic=det)
        h = RowDropout(self.drop_rate, name="drop1")(h, deterministic=det)
        x = res + h

        res = x
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.dim * self.expand, use_bias=False, dtype=self.dtype,
                     name="fc1")(h)
        h = nn.swish(h)
        h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(h)
        h = RowDropout(self.drop_rate, name="drop2")(h, deterministic=det)
        return res + h
