"""Fused whole-block Pallas serving kernels vs the flax modules (eval mode).

Runs in interpret mode on the CPU mesh; the same code path compiles on TPU
(tests/test_attention_kernel.py establishes the interpret==TPU contract for
this kernel style).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.config import EncoderConfig
from ishara_tpu.models.blocks import ConformerBlock, SqueezeformerBlock
from ishara_tpu.models.encoder import build_model
from ishara_tpu.ops.fused_block import (
    fused_conformer_block,
    fused_encoder_forward,
    fused_squeezeformer_block,
)


def _rand_x(rng, T, dim):
    x = rng.standard_normal((T, dim)).astype(np.float32)
    return jnp.asarray(x)


@pytest.mark.parametrize("T,dim,heads,k", [(24, 64, 4, 15), (16, 128, 8, 7)])
def test_fused_squeezeformer_block_parity(rng, T, dim, heads, k):
    block = SqueezeformerBlock(dim, heads, 2, k, dropout=0.0)
    x = _rand_x(rng, T, dim)
    mask = jnp.asarray(rng.random(T) > 0.2)
    variables = block.init(jax.random.key(0), x[None], mask[None], False)
    want = block.apply(variables, x[None], mask[None], False)[0]
    got = fused_squeezeformer_block(x, mask, variables["params"],
                                    num_heads=heads, interpret=True,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_conformer_block_parity(rng):
    T, dim, heads = 24, 64, 4
    block = ConformerBlock(dim, heads, 2, 15, attn_dropout=0.0, drop_rate=0.0)
    x = _rand_x(rng, T, dim)
    mask = jnp.asarray(rng.random(T) > 0.2)
    variables = block.init(jax.random.key(0), x[None], mask[None], False)
    # non-trivial BN stats so the import must carry them
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.default_rng(1).standard_normal(a.shape), jnp.float32)
        ** 2 * 0.5 + 0.2,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    want = block.apply(variables, x[None], mask[None], False)[0]
    got = fused_conformer_block(x, mask, variables["params"],
                                variables["batch_stats"],
                                num_heads=heads, interpret=True,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["squeezeformer", "hybrid", "conformer",
                                     "conv_hybrid", "conv_transformer"])
def test_fused_encoder_forward_parity(rng, variant):
    cfg = EncoderConfig(variant=variant, dim=64, num_squeeze_blocks=2,
                        num_conform_blocks=2, num_heads=4, frame_len=24,
                        transformer_kernel_size=7, dropout=0.0,
                        kernel_sizes=(7, 3), num_conv_per_block=2,
                        top_dropout=0.0, top_mult=1)
    model = build_model(cfg)
    x = rng.standard_normal((24, cfg.input_dim)).astype(np.float32)
    x[18:] = 0.0  # padding frames
    variables = model.init(jax.random.key(0), jnp.asarray(x)[None])
    want = model.apply(variables, jnp.asarray(x)[None], training=False)[0]
    got = fused_encoder_forward(cfg, variables, jnp.asarray(x),
                                interpret=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)
    # bf16 deploy numerics: same program at MXU-bf16 precision stays within
    # ~1% of the f32 logits (serving decodes via argmax)
    got16 = fused_encoder_forward(cfg, variables, jnp.asarray(x),
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_fused_encoder_int8_parity(rng):
    """int8-stored weights with in-kernel dequant == the XLA forward on the
    dequantized tree (i.e. the int8 export bundle's serving numerics)."""
    from ishara_tpu.ops.fused_block import quantize_serving_weights
    from ishara_tpu.serve.export import _dequantize_tree

    cfg = EncoderConfig(variant="hybrid", dim=64, num_squeeze_blocks=2,
                        num_conform_blocks=2, num_heads=4, frame_len=24,
                        transformer_kernel_size=7, dropout=0.0,
                        top_dropout=0.0, top_mult=1)
    model = build_model(cfg)
    x = rng.standard_normal((24, cfg.input_dim)).astype(np.float32)
    x[18:] = 0.0
    variables = model.init(jax.random.key(0), jnp.asarray(x)[None])
    qvars = {"params": quantize_serving_weights(variables["params"]),
             "batch_stats": variables.get("batch_stats", {})}
    deq = {"params": _dequantize_tree(qvars["params"]),
           "batch_stats": qvars["batch_stats"]}
    want = model.apply(deq, jnp.asarray(x)[None], training=False)[0]
    got = fused_encoder_forward(cfg, qvars, jnp.asarray(x), interpret=True,
                                compute_dtype="int8")
    # scale-after-dot == dequantize-then-dot up to fp reassociation; the
    # attention activation dots run bf16 exactly as the deploy default does
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_int8_mode_requires_quantized_params(rng):
    cfg = EncoderConfig(variant="squeezeformer", dim=32,
                        num_squeeze_blocks=1, num_heads=4, frame_len=16,
                        dropout=0.0, top_dropout=0.0, top_mult=1)
    model = build_model(cfg)
    x = jnp.zeros((16, cfg.input_dim), jnp.float32)
    variables = model.init(jax.random.key(0), x[None])
    with pytest.raises(ValueError, match="quantize_serving_weights"):
        fused_encoder_forward(cfg, variables, x, interpret=True,
                              compute_dtype="int8")


def test_fused_encoder_rejects_unsupported_variant(rng):
    cfg = EncoderConfig(variant="squeezeformer_unet", dim=32, frame_len=16)
    with pytest.raises(ValueError):
        fused_encoder_forward(cfg, {"params": {}}, jnp.zeros((16, 276)))


def test_fused_conv_hybrid_int8_parity(rng):
    """The conv-family kernels consume the int8 export scheme too (expand/
    project stream int8, dw/ECA dequantize on load)."""
    from ishara_tpu.ops.fused_block import quantize_serving_weights
    from ishara_tpu.serve.export import _dequantize_tree

    cfg = EncoderConfig(variant="conv_hybrid", dim=64, num_squeeze_blocks=1,
                        num_conform_blocks=1, num_heads=4, frame_len=24,
                        transformer_kernel_size=7, dropout=0.0,
                        kernel_sizes=(7, 3), num_conv_per_block=2,
                        top_dropout=0.0, top_mult=1)
    model = build_model(cfg)
    x = rng.standard_normal((24, cfg.input_dim)).astype(np.float32)
    x[18:] = 0.0
    variables = model.init(jax.random.key(0), jnp.asarray(x)[None])
    qvars = {"params": quantize_serving_weights(variables["params"]),
             "batch_stats": variables.get("batch_stats", {})}
    deq = {"params": _dequantize_tree(qvars["params"]),
           "batch_stats": qvars["batch_stats"]}
    want = model.apply(deq, jnp.asarray(x)[None], training=False)[0]
    got = fused_encoder_forward(cfg, qvars, jnp.asarray(x), interpret=True,
                                compute_dtype="int8")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("n", [1, 3])
def test_stack_matches_chained_blocks(rng, n):
    """The grid-pipelined stack kernel == chaining single-block kernels."""
    from ishara_tpu.ops.fused_block import (
        fused_conformer_stack,
        fused_squeezeformer_stack,
    )

    T, dim, heads, k = 24, 64, 4, 15
    x = _rand_x(rng, T, dim)
    mask = jnp.asarray(rng.random(T) > 0.2)
    sq = SqueezeformerBlock(dim, heads, 2, k, dropout=0.0)
    params = [sq.init(jax.random.key(i), x[None], mask[None], False)["params"]
              for i in range(n)]
    want = x
    for p in params:
        want = fused_squeezeformer_block(want, mask, p, num_heads=heads,
                                         interpret=True,
                                         compute_dtype=jnp.float32)
    got = fused_squeezeformer_stack(x, mask, params, num_heads=heads,
                                    interpret=True,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    cf = ConformerBlock(dim, heads, 2, 15, attn_dropout=0.0, drop_rate=0.0)
    vs = [cf.init(jax.random.key(10 + i), x[None], mask[None], False)
          for i in range(n)]
    want = x
    for v in vs:
        want = fused_conformer_block(want, mask, v["params"],
                                     v["batch_stats"], num_heads=heads,
                                     interpret=True,
                                     compute_dtype=jnp.float32)
    got = fused_conformer_stack(x, mask, [v["params"] for v in vs],
                                [v["batch_stats"] for v in vs],
                                num_heads=heads, interpret=True,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", [1, 3])
def test_dma_stack_matches_auto_stack(rng, n):
    """The manual double-buffered weight-DMA stack == the automatic grid
    pipeline (same bodies, different weight movement)."""
    from ishara_tpu.ops.fused_block import (
        fused_conformer_stack,
        fused_squeezeformer_stack,
    )

    T, dim, heads, k = 24, 64, 4, 15
    x = _rand_x(rng, T, dim)
    mask = jnp.asarray(rng.random(T) > 0.2)
    sq = SqueezeformerBlock(dim, heads, 2, k, dropout=0.0)
    params = [sq.init(jax.random.key(i), x[None], mask[None], False)["params"]
              for i in range(n)]
    want = fused_squeezeformer_stack(x, mask, params, num_heads=heads,
                                     interpret=True,
                                     compute_dtype=jnp.float32)
    got = fused_squeezeformer_stack(x, mask, params, num_heads=heads,
                                    interpret=True,
                                    compute_dtype=jnp.float32, dma=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    cf = ConformerBlock(dim, heads, 2, 15, attn_dropout=0.0, drop_rate=0.0)
    vs = [cf.init(jax.random.key(10 + i), x[None], mask[None], False)
          for i in range(n)]
    want = fused_conformer_stack(x, mask, [v["params"] for v in vs],
                                 [v["batch_stats"] for v in vs],
                                 num_heads=heads, interpret=True,
                                 compute_dtype=jnp.float32)
    got = fused_conformer_stack(x, mask, [v["params"] for v in vs],
                                [v["batch_stats"] for v in vs],
                                num_heads=heads, interpret=True,
                                compute_dtype=jnp.float32, dma=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dma_encoder_forward_parity(rng):
    """fused_encoder_forward(dma=True) == the flax forward (hybrid)."""
    cfg = EncoderConfig(dim=64, variant="hybrid", num_squeeze_blocks=2,
                        num_conform_blocks=2, num_heads=4, frame_len=24,
                        dropout=0.0, top_dropout=0.0)
    model = build_model(cfg)
    x = _rand_x(rng, cfg.frame_len, cfg.input_dim)
    variables = model.init(jax.random.key(0), jnp.asarray(x)[None])
    want = model.apply(variables, jnp.asarray(x)[None], training=False)[0]
    got = fused_encoder_forward(cfg, variables, jnp.asarray(x),
                                interpret=True,
                                compute_dtype=jnp.float32, dma=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
