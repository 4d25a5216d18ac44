"""The Ishara encoder: stem -> block stack -> CTC head, with a parameterized
``get_model`` mirroring the reference API (``conv-hybrid-model.ipynb`` cell 7,
``README.md:73-80``) across all five reference model families.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import EncoderConfig
from ..preprocess.pipeline import frame_mask
from .blocks import Conv1DBlock, ConformerBlock, SqueezeformerBlock, TransformerBlock
from .layers import FastDropout, BN_EPS, BN_MOMENTUM, positional_encoding


class IsharaEncoder(nn.Module):
    """[B, T, input_dim] landmarks -> [B, T, num_classes] CTC logits.

    Stem follows the reference ``get_model`` (nb cell 7): Masking(0.0)
    semantics -> biasless Dense -> +fixed sin/cos PE -> BatchNorm(0.95), then
    the block stack for the configured variant, then
    Dense(dim*top_mult, relu) -> Dropout -> Dense(num_classes).
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        mask = frame_mask(x)  # [B, T] — Keras Masking(0.0) contract

        # rematerialization: recompute block activations in the backward pass
        # instead of storing them (jax.checkpoint) — enables much larger
        # batches per chip at ~1.3x step FLOPs
        def maybe_remat(block_cls):
            # static_argnums=3: the `training` bool (self, x, mask, training)
            if cfg.remat:
                return nn.remat(block_cls, static_argnums=(3,))
            return block_cls

        SqueezeformerBlockR = maybe_remat(SqueezeformerBlock)
        ConformerBlockR = maybe_remat(ConformerBlock)
        TransformerBlockR = maybe_remat(TransformerBlock)

        x = x.astype(dtype)
        x = nn.Dense(cfg.dim, use_bias=False, dtype=dtype, name="stem_conv")(x)
        pe = positional_encoding(cfg.frame_len, cfg.dim)[: x.shape[1]]
        x = x + jnp.asarray(pe, dtype)
        x = nn.BatchNorm(use_running_average=not training, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=dtype, name="stem_bn")(x)

        def conv_stack(x, tag):
            for j in range(cfg.num_conv_per_block):
                k = cfg.kernel_sizes[j % len(cfg.kernel_sizes)]
                x = Conv1DBlock(cfg.dim, k, drop_rate=cfg.dropout, dtype=dtype,
                                name=f"conv_{tag}_{j}")(x, mask=mask,
                                                        training=training)
            return x

        v = cfg.variant
        if cfg.causal and v not in ("squeezeformer", "conformer", "hybrid"):
            raise ValueError(
                f"causal/streaming mode supports the attention-block "
                f"families, not {v!r} (the conv families' ECA gate is "
                f"whole-sequence)")
        if v in ("squeezeformer", "hybrid"):
            for i in range(cfg.num_squeeze_blocks):
                x = SqueezeformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.transformer_kernel_size, cfg.dropout, dtype=dtype,
                    use_flash=cfg.use_flash, causal=cfg.causal,
                    attn_context=cfg.attn_context if cfg.causal else 0,
                    name=f"squeezeformer_{i}")(x, mask, training)
        if v in ("conformer", "hybrid"):
            for i in range(cfg.num_conform_blocks):
                x = ConformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.transformer_kernel_size, cfg.dropout, cfg.dropout,
                    dtype=dtype, use_flash=cfg.use_flash, causal=cfg.causal,
                    attn_context=cfg.attn_context if cfg.causal else 0,
                    name=f"conformer_{i}")(x, mask, training)
        if v == "conv_hybrid":
            for i in range(cfg.num_squeeze_blocks):
                x = conv_stack(x, f"squeeze{i}")
                x = SqueezeformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.transformer_kernel_size, cfg.dropout, dtype=dtype,
                    use_flash=cfg.use_flash,
                    name=f"squeezeformer_{i}")(x, mask, training)
            for i in range(cfg.num_conform_blocks):
                x = conv_stack(x, f"conform{i}")
                x = ConformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.transformer_kernel_size, cfg.dropout, cfg.dropout,
                    dtype=dtype, use_flash=cfg.use_flash,
                    name=f"conformer_{i}")(x, mask, training)
        if v == "conv_transformer":
            for i in range(cfg.num_squeeze_blocks):
                x = conv_stack(x, f"t{i}")
                x = TransformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.dropout, cfg.dropout, dtype=dtype,
                    use_flash=cfg.use_flash,
                    name=f"transformer_{i}")(x, mask, training)
        if v == "parallel_branches":
            # reference conv-conformer-test-2.ipynb: N Conformer || M
            # Squeezeformer branches from the same stem, channel-concat,
            # Dense merge. The reference recorded this variant as a failure
            # (NaN losses, Final_Report p.10-11); it is rebuilt for
            # architecture-inventory completeness — the fused step's
            # non-finite guard (train/state._finish_step) contains the
            # failure mode the reference could not.
            a = b = x
            for i in range(cfg.num_conform_blocks):
                a = ConformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.transformer_kernel_size, cfg.dropout, cfg.dropout,
                    dtype=dtype, use_flash=cfg.use_flash,
                    name=f"conformer_{i}")(a, mask, training)
            for i in range(cfg.num_squeeze_blocks):
                b = SqueezeformerBlockR(
                    cfg.dim, cfg.num_heads, cfg.expansion_factor,
                    cfg.transformer_kernel_size, cfg.dropout, dtype=dtype,
                    use_flash=cfg.use_flash,
                    name=f"squeezeformer_{i}")(b, mask, training)
            x = nn.Dense(cfg.dim, dtype=dtype, name="merge")(
                jnp.concatenate([a, b], axis=-1))
        if v not in ("squeezeformer", "conformer", "hybrid", "conv_hybrid",
                     "conv_transformer", "parallel_branches"):
            raise ValueError(f"unknown variant {v!r}")

        x = nn.Dense(cfg.dim * cfg.top_mult, dtype=dtype, name="top_conv")(x)
        x = nn.relu(x)
        x = FastDropout(cfg.top_dropout)(x, deterministic=not training)
        x = nn.Dense(cfg.num_classes, dtype=dtype, name="classifier")(x)
        return x.astype(jnp.float32)


class _SpeechUNetAdapter(nn.Module):
    """Adapts the speech-style Temporal U-Net Squeezeformer
    (models.squeezeformer_unet) to the IsharaEncoder calling convention so it
    trains/exports through the same Trainer/bundle machinery. Its CTC head
    emits log-probs; log_softmax is idempotent, so downstream CTC loss and
    greedy decode are unaffected."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .squeezeformer_unet import Squeezeformer

        cfg = self.cfg
        mask = frame_mask(x)
        n = max(cfg.num_squeeze_blocks, 2)
        return Squeezeformer(
            num_classes=cfg.num_classes,
            dim=cfg.dim,
            num_layers=n,
            num_heads=cfg.num_heads,
            reduce_idx=max(n // 3, 1) if cfg.frame_len % 2 == 0 else 0,
            recover_idx=max(2 * n // 3, 2),
            dropout=cfg.dropout,
            dtype=jnp.dtype(cfg.dtype),
            name="unet",
        )(x, mask=mask, training=training)


def build_model(cfg: EncoderConfig) -> nn.Module:
    """Model factory over ALL CTC families, including the Temporal U-Net
    speech variant — the single constructor used by Trainer, export/load and
    the driver entries."""
    if cfg.variant == "squeezeformer_unet":
        return _SpeechUNetAdapter(cfg)
    return IsharaEncoder(cfg)


def get_model(
    dim: int = 256,
    num_conv_squeeze_blocks: int = 2,
    num_conv_conform_blocks: int = 2,
    kernel_sizes: tuple[int, ...] = (11, 5, 3),
    num_conv_per_block: int = 3,
    dropout_rate: float = 0.2,
    num_heads: int = 8,
    expansion_factor: int = 2,
    transformer_kernel_size: int = 15,
    variant: str = "conv_hybrid",
    **kwargs,
) -> IsharaEncoder:
    """Parameterized constructor mirroring the reference README API
    (``conv-hybrid-model.ipynb`` cell 7). Extra kwargs feed EncoderConfig."""
    cfg = EncoderConfig(
        dim=dim,
        variant=variant,
        num_squeeze_blocks=num_conv_squeeze_blocks,
        num_conform_blocks=num_conv_conform_blocks,
        kernel_sizes=tuple(kernel_sizes),
        num_conv_per_block=num_conv_per_block,
        dropout=dropout_rate,
        num_heads=num_heads,
        expansion_factor=expansion_factor,
        transformer_kernel_size=transformer_kernel_size,
        top_mult=2 if variant in ("conv_hybrid", "squeezeformer") else 1,
        **kwargs,
    )
    return IsharaEncoder(cfg)
