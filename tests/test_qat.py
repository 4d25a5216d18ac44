"""Quantization-aware training (train/qat.py, ROADMAP #7)."""

import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.train.qat import fake_quant, fake_quant_tree


def test_fake_quant_matches_int8_export_roundtrip(rng):
    """The in-training fake-quantizer must see EXACTLY the weights the int8
    export bundle will serve."""
    from ishara_tpu.serve.export import _dequantize_tree, _quantize_tree

    tree = {
        "dense": {"kernel": rng.standard_normal((64, 32)).astype(np.float32),
                  "bias": rng.standard_normal(32).astype(np.float32)},
        "conv": {"kernel": rng.standard_normal((3, 16, 16)).astype(np.float32)},
    }
    want = _dequantize_tree(_quantize_tree(tree))
    got = fake_quant_tree(jax.tree_util.tree_map(jnp.asarray, tree))
    np.testing.assert_allclose(np.asarray(got["dense"]["kernel"]),
                               np.asarray(want["dense"]["kernel"]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["conv"]["kernel"]),
                               np.asarray(want["conv"]["kernel"]), atol=1e-7)
    # 1-D leaves untouched in both
    np.testing.assert_array_equal(np.asarray(got["dense"]["bias"]),
                                  tree["dense"]["bias"])
    np.testing.assert_array_equal(np.asarray(want["dense"]["bias"]),
                                  tree["dense"]["bias"])


def test_ste_gradient_passes_through(rng):
    w = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quant(w) * 2.0))(w)
    # scale is stop-gradient and |w/scale| <= 127 by construction, so the
    # STE gradient is exactly the downstream cotangent
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)


def test_qat_step_trains(rng):
    """A QAT train step runs and reduces loss on a tiny overfit problem."""
    from ishara_tpu.config import EncoderConfig, TrainConfig
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.models import IsharaEncoder
    from ishara_tpu.preprocess import GroupStats
    from ishara_tpu.train import TrainState, make_optimizer
    from ishara_tpu.train.state import make_fused_ctc_train_step

    cfg = EncoderConfig(dim=32, variant="hybrid", num_squeeze_blocks=1,
                        num_conform_blocks=1, num_heads=4, frame_len=32,
                        transformer_kernel_size=7, dropout=0.0,
                        top_dropout=0.0, top_mult=1)
    model = IsharaEncoder(cfg)
    tok = CTCTokenizer()
    ds = SyntheticASLFR(num_sequences=8, seed=0, max_phrase=4)
    batch = ds.batch(range(8), tok, max_frames=48)
    jb = {k: jnp.asarray(batch[k]) for k in ("raw", "lengths", "labels")}
    tx, _ = make_optimizer(TrainConfig(steps_per_epoch=5, lr_max=3e-3))
    sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    state = TrainState.create(model, tx, sample)
    step = jax.jit(make_fused_ctc_train_step(
        GroupStats.identity(), cfg.frame_len, aug_prob=0.0,
        blank_id=cfg.blank_id, qat=True))
    losses = []
    for i in range(60):
        state, m = step(state, jb, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_qat_eval_scores_int8_numerics(rng):
    """The qat eval step's logits equal evaluating the int8-exported
    weights directly."""
    from ishara_tpu.config import EncoderConfig
    from ishara_tpu.data.synthetic import SyntheticASLFR
    from ishara_tpu.data.tokenizer import CTCTokenizer
    from ishara_tpu.models import IsharaEncoder
    from ishara_tpu.preprocess import GroupStats, preprocess_batch
    from ishara_tpu.train import TrainState, make_optimizer
    from ishara_tpu.train.state import make_fused_ctc_eval_step
    from ishara_tpu.config import TrainConfig

    cfg = EncoderConfig(dim=32, variant="squeezeformer", num_squeeze_blocks=1,
                        num_heads=4, frame_len=32, transformer_kernel_size=7,
                        dropout=0.0, top_dropout=0.0, top_mult=1)
    model = IsharaEncoder(cfg)
    tok = CTCTokenizer()
    ds = SyntheticASLFR(num_sequences=4, seed=1, max_phrase=4)
    batch = ds.batch(range(4), tok, max_frames=40)
    jb = {k: jnp.asarray(batch[k]) for k in ("raw", "lengths", "labels")}
    tx, _ = make_optimizer(TrainConfig())
    sample = jnp.zeros((1, cfg.frame_len, cfg.input_dim), jnp.float32)
    state = TrainState.create(model, tx, sample)

    ev = make_fused_ctc_eval_step(GroupStats.identity(), cfg.frame_len,
                                  cfg.blank_id, qat=True)
    out = ev(state, jb)

    from ishara_tpu.serve.export import _dequantize_tree, _quantize_tree
    qparams = _dequantize_tree(_quantize_tree(
        jax.tree_util.tree_map(np.asarray, state.params)))
    x = preprocess_batch(jb["raw"], jb["lengths"], GroupStats.identity(),
                         cfg.frame_len)
    logits = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, qparams),
         "batch_stats": state.batch_stats}, x, training=False)
    ids, counts = out["ids"], out["counts"]
    from ishara_tpu.decode.greedy import greedy_decode_batch
    ids2, counts2 = greedy_decode_batch(logits, blank_id=cfg.blank_id)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts2))
