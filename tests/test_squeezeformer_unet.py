import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.models.squeezeformer_unet import (
    RelativeMultiHeadAttention,
    Squeezeformer,
    SpeechSqueezeformerEncoder,
    recover_resolution,
    rel_positional_encoding,
)


def test_rel_shift_alignment():
    """The relative-shift trick must place relative position 0 on the
    diagonal: with position embeddings that are a delta at rel-pos 0, the
    positional score contribution collapses to an identity pattern."""
    B, H, T, D = 1, 1, 4, 8
    # pos scores [B,H,T,2T-1] with a spike at index T-1 (= rel pos 0)
    pos = jnp.zeros((B, H, T, 2 * T - 1)).at[:, :, :, T - 1].set(1.0)
    shifted = RelativeMultiHeadAttention._rel_shift(pos)
    np.testing.assert_allclose(np.asarray(shifted[0, 0]), np.eye(T), atol=1e-6)


def test_rel_pe_shape():
    pe = rel_positional_encoding(10, 16)
    assert pe.shape == (19, 16)
    # center row is position 0 -> sin component zero
    np.testing.assert_allclose(pe[9, 0::2], 0.0, atol=1e-6)


def test_recover_resolution():
    x = jnp.arange(6.0).reshape(1, 3, 2)
    up = recover_resolution(x, 5)
    assert up.shape == (1, 5, 2)
    np.testing.assert_allclose(np.asarray(up[0, :, 0]), [0, 0, 2, 2, 4])


def test_unet_encoder_shapes():
    B, T, F = 2, 24, 276
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T, F)).astype(np.float32))
    mask = jnp.ones((B, T), bool)
    enc = SpeechSqueezeformerEncoder(dim=32, num_layers=4, num_heads=2,
                                     reduce_idx=1, recover_idx=3)
    vars_ = enc.init(jax.random.key(0), x, mask)
    out = enc.apply(vars_, x, mask)
    assert out.shape == (B, T, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_ctc_model_log_probs():
    B, T, F = 2, 16, 276
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T, F)).astype(np.float32))
    model = Squeezeformer(num_classes=60, dim=32, num_layers=2, num_heads=2,
                          reduce_idx=0, recover_idx=1)
    vars_ = model.init(jax.random.key(0), x)
    lp = model.apply(vars_, x)
    assert lp.shape == (B, T, 60)
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)


def test_unet_variant_trains_via_factory():
    """The speech U-Net family trains through the standard factory/Trainer
    machinery (build_model + fused CTC step)."""
    import optax

    from ishara_tpu.config import EncoderConfig
    from ishara_tpu.models import build_model
    from ishara_tpu.train import TrainState, ctc_train_step

    cfg = EncoderConfig(variant="squeezeformer_unet", dim=32,
                        num_squeeze_blocks=3, num_heads=2, frame_len=16,
                        dropout=0.0)
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 16, 276)).astype(np.float32))
    labels = jnp.full((4, 6), 59, jnp.int32).at[:, :2].set(5)
    state = TrainState.create(model, optax.adam(3e-3), x[:1],
                              lookahead_sync_period=1)
    step = jax.jit(ctc_train_step)
    losses = []
    for _ in range(30):
        state, m = step(state, {"x": x, "labels": labels}, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses[::10]
