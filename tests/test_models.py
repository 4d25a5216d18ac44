import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishara_tpu.config import EncoderConfig, baseline_config
from ishara_tpu.models import IsharaEncoder, get_model, positional_encoding

B, T, F = 2, 32, 276


def tiny_cfg(**kw):
    base = dict(dim=64, num_squeeze_blocks=1, num_conform_blocks=1,
                num_heads=4, frame_len=T, num_conv_per_block=1)
    base.update(kw)
    return EncoderConfig(**base)


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((B, T, F)).astype(np.float32)
    arr[:, T // 2:] = 0.0  # masked tail
    return jnp.asarray(arr)


@pytest.mark.parametrize("variant", [
    "squeezeformer", "conformer", "hybrid", "conv_hybrid", "conv_transformer",
])
def test_forward_shapes_all_variants(x, variant):
    model = IsharaEncoder(tiny_cfg(variant=variant))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (B, T, 60)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_mutates_batch_stats(x):
    model = IsharaEncoder(tiny_cfg(variant="hybrid"))
    vars_ = model.init(jax.random.key(0), x)
    out, updates = model.apply(
        vars_, x, training=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert out.shape == (B, T, 60)
    # stem BN stats must move
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_mask_crop_vs_pad_equivalence(x):
    """For the fully-causal squeezeformer family in eval mode, zero-padding
    the tail must not change valid-frame logits vs. running on the cropped
    sequence (mask-vs-crop equivalence, SURVEY.md §7 watch list)."""
    model = IsharaEncoder(tiny_cfg(variant="squeezeformer"))
    vars_ = model.init(jax.random.key(0), x)
    out_padded = model.apply(vars_, x)
    out_cropped = model.apply(vars_, x[:, : T // 2])
    np.testing.assert_allclose(
        np.asarray(out_padded[:, : T // 2]), np.asarray(out_cropped),
        rtol=1e-4, atol=1e-4,
    )


def test_get_model_reference_api(x):
    model = get_model(dim=64, num_conv_squeeze_blocks=1,
                      num_conv_conform_blocks=1, num_conv_per_block=1,
                      frame_len=T)
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (B, T, 60)


def test_positional_encoding_layout():
    pe = positional_encoding(8, 64)
    assert pe.shape == (8, 64)
    np.testing.assert_allclose(pe[0, :32], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(pe[0, 32:], 1.0, atol=1e-7)   # cos(0)


def test_baseline_configs_roundtrip(tmp_path):
    for i in range(1, 6):
        cfg = baseline_config(i)
        p = tmp_path / f"cfg{i}.json"
        cfg.to_json(p)
        cfg2 = type(cfg).from_json(p)
        assert cfg2.model == cfg.model


def test_parallel_branches_variant_forward_and_train():
    """The parallel-branches architecture (conv-conformer-test-2.ipynb:
    Conformer || Squeezeformer -> concat -> Dense merge) — the reference
    recorded it as a NaN failure; here it must run a finite train step
    (the fused step's non-finite guard contains blowups regardless)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ishara_tpu.config import EncoderConfig
    from ishara_tpu.models import build_model
    from ishara_tpu.train import TrainState, ctc_train_step

    cfg = EncoderConfig(variant="parallel_branches", dim=32,
                        num_squeeze_blocks=2, num_conform_blocks=2,
                        num_heads=4, frame_len=16,
                        transformer_kernel_size=7, dropout=0.1)
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 16, 276)).astype(np.float32))
    labels = jnp.full((4, 6), 59, jnp.int32).at[:, :2].set(5)
    state = TrainState.create(model, optax.adam(3e-3), x[:1],
                              lookahead_sync_period=1)
    step = jax.jit(ctc_train_step)
    losses = []
    for _ in range(10):
        state, m = step(state, {"x": x, "labels": labels}, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
