"""Train state and the jitted/pjit train step.

One compiled XLA program per step: forward (bf16-capable), CTC loss, backward,
RAdam update with lr-coupled weight decay, Lookahead sync via `where` on the
step counter, BatchNorm batch-stat update — no host round-trips (contrast the
reference's per-batch CPU Levenshtein sync, integration.py:736-745).

Under a data mesh the same function pjit-shards: batch sharded on ``data``,
state replicated; XLA emits the ICI all-reduce for gradients and the
cross-replica BatchNorm mean (GSPMD global-batch reduction).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.ctc import ctc_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    slow_params: Any          # Lookahead slow weights
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    lookahead_sync_period: int = struct.field(pytree_node=False, default=5)
    lookahead_alpha: float = struct.field(pytree_node=False, default=0.5)
    # in-program count of skipped non-finite batches: EVERY skip is recorded
    # on device, so host-side loss sampling can stay sparse
    nonfinite_count: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    @classmethod
    def create(cls, model, tx, sample_input, rng=None, **kw):
        rng = jax.random.key(0) if rng is None else rng
        variables = model.init(rng, sample_input)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # distinct buffers: params/slow_params may both be donated later
            slow_params=jax.tree_util.tree_map(jnp.array, params),
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=model.apply,
            **kw,
        )



def _select(ok, new, old):
    return jax.tree_util.tree_map(lambda n, o: jnp.where(ok, n, o), new, old)


def _finish_step(state: "TrainState", loss, grads, new_batch_stats):
    """Optimizer update + Lookahead + non-finite guard, shared by the CTC
    train steps. A non-finite loss (the reference's skip-batch failure mode,
    integration.py:779-788) leaves every state leaf unchanged — the guard is
    inside the compiled program so donated buffers stay valid."""
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    fast = optax.apply_updates(state.params, updates)
    k = state.lookahead_sync_period
    if k > 1:
        sync = (state.step + 1) % k == 0
        alpha = state.lookahead_alpha
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + alpha * (f - s), s),
            state.slow_params, fast,
        )
        new_fast = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s, f), new_slow, fast
        )
    else:
        new_slow, new_fast = fast, fast

    grad_norm = optax.global_norm(grads)
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    new_state = state.replace(
        step=state.step + 1,
        params=_select(ok, new_fast, state.params),
        slow_params=_select(ok, new_slow, state.slow_params),
        batch_stats=_select(ok, new_batch_stats, state.batch_stats),
        opt_state=_select(ok, new_opt_state, state.opt_state),
        nonfinite_count=state.nonfinite_count + jnp.where(ok, 0, 1),
    )
    metrics = {"loss": loss, "grad_norm": grad_norm}
    return new_state, metrics


def ctc_train_step(
    state: TrainState, batch: dict, rng: jax.Array, blank_id: int = 59
) -> tuple[TrainState, dict]:
    """One CTC training step. ``batch``: x [B,T,F] float32, labels [B,U]."""
    dropout_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        logits, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["x"],
            training=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        loss = ctc_loss(logits, batch["labels"], blank_id=blank_id)
        return loss, updates["batch_stats"]

    (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return _finish_step(state, loss, grads, new_batch_stats)


def make_fused_ctc_train_step(
    stats, frame_len: int, aug_prob: float = 0.2, blank_id: int = 59,
    lr_flip_prob: float = 0.0, dominant_hand: bool = False,
    qat: bool = False, with_grads: bool = False,
):
    """Train step with augmentation + preprocessing fused into the same XLA
    program: batch arrives raw ([B, Tmax, 276] + lengths), the whole
    augment -> resample/normalize -> forward -> CTC -> backward -> update
    chain is one dispatch (the reference splits this across tf.data threads
    and the training graph). ``dominant_hand`` canonicalizes handedness in
    the fused preprocess (must match serving); ``lr_flip_prob`` enables the
    LR-flip aug; ``qat`` trains through the int8 fake-quantizer
    (train/qat.py) so the int8 export bundle is accuracy-faithful."""
    from ..preprocess.augment import augment
    from ..preprocess.pipeline import preprocess
    from .qat import fake_quant_tree

    def step(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        aug_rng, dropout_rng = jax.random.split(step_rng)
        B = batch["raw"].shape[0]
        keys = jax.random.split(aug_rng, B)

        def prep(key, raw, length):
            raw, length = augment(key, raw, length, prob=aug_prob,
                                  flip_prob=lr_flip_prob)
            return preprocess(raw, length, stats, frame_len,
                              dominant_hand=dominant_hand)

        x = jax.vmap(prep)(keys, batch["raw"], batch["lengths"])

        def loss_fn(params):
            if qat:
                params = fake_quant_tree(params)
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, training=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss = ctc_loss(logits, batch["labels"], blank_id=blank_id)
            return loss, updates["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state, metrics = _finish_step(state, loss, grads,
                                          new_batch_stats)
        if with_grads:
            # histogram-instrumented variant (TrainConfig.
            # histogram_every_steps): same update, grads also returned so
            # the Trainer can log per-layer histograms (wandb.watch parity)
            metrics["grads"] = grads
        return new_state, metrics

    return step


def make_fused_ctc_eval_step(stats, frame_len: int, blank_id: int = 59,
                             dominant_hand: bool = False, qat: bool = False):
    """Eval step: preprocess (no aug) -> forward -> loss -> greedy decode,
    one program. With ``qat`` the forward runs through the same int8
    fake-quantizer as training, so validation scores reflect the int8
    deployment numerics."""
    from ..decode.greedy import greedy_decode_batch
    from ..preprocess.pipeline import preprocess
    from .qat import fake_quant_tree

    def step(state: TrainState, batch: dict):
        x = jax.vmap(
            lambda r, l: preprocess(r, l, stats, frame_len,
                                    dominant_hand=dominant_hand)
        )(batch["raw"], batch["lengths"])
        params = fake_quant_tree(state.params) if qat else state.params
        logits = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, training=False,
        )
        per_seq = ctc_loss(logits, batch["labels"], blank_id=blank_id,
                           reduction="none")
        ids, counts = greedy_decode_batch(logits, blank_id=blank_id)
        # loss_per_seq lets the Trainer pad the validation tail batch to the
        # static batch size (one compile) and still average over real rows
        return {"loss": jnp.mean(per_seq), "loss_per_seq": per_seq,
                "ids": ids, "counts": counts}

    return step


def ctc_eval_step(state: TrainState, batch: dict, blank_id: int = 59) -> dict:
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["x"],
        training=False,
    )
    loss = ctc_loss(logits, batch["labels"], blank_id=blank_id)
    return {"loss": loss, "logits": logits}
