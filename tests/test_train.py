"""End-to-end training: overfit a tiny model on synthetic data, and run the
sharded train step on a virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.config import EncoderConfig, TrainConfig
from ishara_tpu.data.synthetic import SyntheticASLFR
from ishara_tpu.data.tokenizer import CTCTokenizer
from ishara_tpu.decode import greedy_decode_batch
from ishara_tpu.models import IsharaEncoder
from ishara_tpu.parallel import batch_sharding, make_mesh, replicated
from ishara_tpu.preprocess import GroupStats, preprocess_batch
from ishara_tpu.train import TrainState, ctc_train_step, make_optimizer

FRAME_LEN = 48
MAX_RAW = 96


def make_setup(batch_size=8, dim=64):
    tok = CTCTokenizer()
    ds = SyntheticASLFR(num_sequences=batch_size, frames_per_char=6,
                        min_phrase=2, max_phrase=4, nan_frac=0.02)
    batch = ds.batch(range(batch_size), tok, max_frames=MAX_RAW, max_phrase=16)
    x = preprocess_batch(
        jnp.asarray(batch["raw"]), jnp.asarray(batch["lengths"]),
        GroupStats.identity(), frame_len=FRAME_LEN,
    )
    cfg = EncoderConfig(dim=dim, variant="squeezeformer", num_squeeze_blocks=1,
                        num_heads=4, frame_len=FRAME_LEN, dropout=0.0,
                        top_dropout=0.0)
    model = IsharaEncoder(cfg)
    tcfg = TrainConfig(lr_max=3e-3, warmup_epochs=0, num_epochs=1,
                       steps_per_epoch=10_000, optimizer="radam_lookahead")
    tx, _ = make_optimizer(tcfg)
    state = TrainState.create(model, tx, x[:1])
    return tok, batch, x, state


def test_overfit_tiny_batch():
    tok, batch, x, state = make_setup()
    train = jax.jit(ctc_train_step)
    rng = jax.random.key(0)
    jb = {"x": x, "labels": jnp.asarray(batch["labels"])}
    losses = []
    for _ in range(250):
        state, metrics = train(state, jb, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.2, losses[::25]
    # decode should recover most phrases
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats}, x,
        training=False)
    ids, ns = greedy_decode_batch(logits)
    preds = [tok.decode(np.asarray(i)[: int(n)]) for i, n in zip(ids, ns)]
    from ishara_tpu.evaluation import normalized_levenshtein

    score = normalized_levenshtein(preds, batch["phrases"])
    assert score >= 0.6, (score, list(zip(preds, batch["phrases"])))


def test_sharded_train_step_8_devices():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    tok, batch, x, state = make_setup(batch_size=16)
    mesh = make_mesh(8)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    state = jax.device_put(state, rep)
    jb = {
        "x": jax.device_put(x, bs),
        "labels": jax.device_put(jnp.asarray(batch["labels"]), bs),
    }
    train = jax.jit(
        ctc_train_step,
        in_shardings=(rep, {"x": bs, "labels": bs}, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    rng = jax.device_put(jax.random.key(0), rep)
    l0 = None
    for _ in range(3):
        state, metrics = train(state, jb, rng)
        l0 = l0 or float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated and finite
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
