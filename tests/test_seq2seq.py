"""Torch-path parity family: on-device Levenshtein, ASLTranslationModel,
translation train step, AR greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from ishara_tpu.data.tokenizer import Seq2SeqTokenizer
from ishara_tpu.decode.autoregressive import greedy_translate
from ishara_tpu.evaluation.metrics import levenshtein
from ishara_tpu.models.seq2seq import ASLTranslationModel
from ishara_tpu.ops.levenshtein import batched_edit_distance, normalized_similarity
from ishara_tpu.train import TrainState
from ishara_tpu.train.translation import make_translation_train_step, token_lengths

import optax


def test_edit_distance_matches_python(rng):
    N, M = 12, 10
    for _ in range(30):
        la, lb = int(rng.integers(0, N + 1)), int(rng.integers(0, M + 1))
        a = rng.integers(0, 5, N).astype(np.int32)
        b = rng.integers(0, 5, M).astype(np.int32)
        want = levenshtein(
            "".join(map(chr, a[:la] + 65)), "".join(map(chr, b[:lb] + 65))
        )
        got = int(batched_edit_distance(
            jnp.asarray(a)[None], jnp.asarray(b)[None],
            jnp.asarray([la]), jnp.asarray([lb]))[0])
        assert got == want, (a[:la], b[:lb], got, want)


def test_token_lengths():
    ids = jnp.asarray([[5, 6, 2, 0, 0], [5, 6, 7, 8, 9], [0, 0, 0, 0, 0]])
    lens = token_lengths(ids, eos=2, pad=0)
    assert lens.tolist() == [2, 5, 0]


def test_normalized_similarity_range(rng):
    a = jnp.asarray(rng.integers(3, 30, (4, 8)).astype(np.int32))
    sim = normalized_similarity(a, a, jnp.full((4,), 8), jnp.full((4,), 8))
    np.testing.assert_allclose(np.asarray(sim), 1.0)


def make_model(B=2, T=16):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T, 92, 3)).astype(np.float32))
    mask = jnp.ones((B, T), bool)
    model = ASLTranslationModel(num_classes=62, feature_dim=64, num_heads=4)
    tgt = jnp.asarray([[1, 5, 6, 2, 0, 0]] * B, jnp.int32)
    variables = model.init(jax.random.key(0), x, mask, tgt)
    return model, variables, x, mask, tgt


def test_conformer_encoder_forward_and_grad():
    """Torch-path ConformerBlock (integration.py:142-201) as the seq2seq
    encoder: forward shapes + finite training gradients, and a genuinely
    different parameterization than the squeezeformer blocks."""
    B, T = 2, 16
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, T, 92, 3)).astype(np.float32))
    mask = jnp.ones((B, T), bool)
    tgt = jnp.asarray([[1, 5, 6, 2, 0, 0]] * B, jnp.int32)
    model = ASLTranslationModel(num_classes=62, feature_dim=64, num_heads=4,
                                encoder_type="conformer")
    variables = model.init(jax.random.key(0), x, mask, tgt)
    blk = variables["params"]["squeezeformer_layers_0"]
    # conformer layout: single FFN ("ff"), no ff1/ff2 sandwich
    assert "ff" in blk and "ff1" not in blk and "scale" in blk

    (out, conf) = model.apply(variables, x, mask, tgt)
    assert out.shape == (B, 6, 62) and conf.shape == (B,)

    def loss_fn(params):
        (logits, confidence), updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mask, tgt, training=True,
            rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
        return jnp.mean(logits ** 2) + jnp.mean(confidence ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = jax.tree_util.tree_map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    flat = jax.tree_util.tree_leaves(norms)
    assert all(np.isfinite(v) for v in flat)
    assert sum(v > 0 for v in flat) > len(flat) * 0.8


def test_forward_shapes():
    model, variables, x, mask, tgt = make_model()
    (out, conf) = model.apply(variables, x, mask, tgt)
    assert out.shape == (2, 6, 62)
    assert conf.shape == (2,)
    # validation mode: classifier over encoder states
    (out2, conf2) = model.apply(variables, x, mask, None)
    assert out2.shape == (2, 16, 62)


def test_causal_decoder():
    """Changing future target tokens must not affect earlier positions."""
    model, variables, x, mask, tgt = make_model()
    out1, _ = model.apply(variables, x, mask, tgt)
    tgt2 = tgt.at[:, 4].set(9)
    out2, _ = model.apply(variables, x, mask, tgt2)
    np.testing.assert_allclose(np.asarray(out1[:, :4]),
                               np.asarray(out2[:, :4]), rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, 4:]), np.asarray(out2[:, 4:]))


def test_translation_train_step_runs_and_descends():
    model, variables, x, mask, tgt = make_model()
    tx = optax.adam(3e-3)
    # init needs mask/tgt so decoder params exist -> build the state manually
    variables = model.init(jax.random.key(1), x, mask, tgt)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        slow_params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
        apply_fn=model.apply, lookahead_sync_period=1)
    step = jax.jit(make_translation_train_step())
    batch = {"x": x, "mask": mask, "tokens": tgt}
    rng = jax.random.key(0)
    losses = []
    for _ in range(40):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert np.isfinite(m["confidence_mean"])


def test_greedy_translate_shapes_and_eos():
    model, variables, x, mask, tgt = make_model()
    tokens, conf = jax.jit(
        lambda v, x, m: greedy_translate(model, v, x, m, max_len=8)
    )(variables, x, mask)
    assert tokens.shape == (2, 8)
    assert (np.asarray(tokens)[:, 0] == 1).all()  # sos
    tok = Seq2SeqTokenizer()
    texts = [tok.decode(np.asarray(t)) for t in tokens]
    assert all(isinstance(t, str) for t in texts)
