"""Tensor-parallel sharding on a 4x2 (data, model) CPU mesh: rules hit the
right kernels, the train step runs, and results match the replicated run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ishara_tpu.config import EncoderConfig, TrainConfig
from ishara_tpu.models import IsharaEncoder
from ishara_tpu.parallel.tp import make_2d_mesh, shard_state_tp, tp_param_shardings
from ishara_tpu.train import TrainState, ctc_train_step, make_optimizer

T, F = 16, 276


def make_state(dim=64):
    cfg = EncoderConfig(dim=dim, variant="hybrid", num_squeeze_blocks=1,
                        num_conform_blocks=1, num_heads=4, frame_len=T,
                        dropout=0.0, top_dropout=0.0)
    model = IsharaEncoder(cfg)
    tcfg = TrainConfig(steps_per_epoch=100, warmup_epochs=0)
    tx, _ = make_optimizer(tcfg)
    x = jnp.zeros((1, T, F), jnp.float32)
    return TrainState.create(model, tx, x, rng=jax.random.key(0))


def test_tp_rules_hit_attention_and_ffn():
    state = make_state()
    mesh = make_2d_mesh(4, 2)
    shardings = tp_param_shardings(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = {jax.tree_util.keystr(p) for p, s in flat
               if s.spec != P()}
    assert any("qkv" in s for s in sharded), sharded
    assert any("fc1" in s for s in sharded)
    assert any("fc2" in s for s in sharded)
    # LayerNorm scales must stay replicated
    assert not any("norm" in s and "kernel" not in s for s in sharded)


def test_tp_step_matches_replicated():
    B = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    labels = jnp.full((B, 8), 59, jnp.int32).at[:, :3].set(7)
    batch = {"x": x, "labels": labels}
    key = jax.random.key(1)

    # replicated single-device run
    state1 = make_state()
    s1, m1 = jax.jit(ctc_train_step)(state1, batch, key)

    # TP run over (data=4, model=2)
    mesh = make_2d_mesh(4, 2)
    state2 = shard_state_tp(make_state(), mesh)
    bsh = NamedSharding(mesh, P("data"))
    batch2 = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    s2, m2 = jax.jit(ctc_train_step)(
        state2, batch2, jax.device_put(key, NamedSharding(mesh, P())))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # updated params agree
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-3, atol=1e-4)
