"""Training step for the encoder-decoder (torch-path) model.

Key TPU-first change vs. the reference: the confidence target — the
normalized Levenshtein similarity between the greedy prediction and the
target (integration.py:736-745) — is computed **on device** with the batched
wavefront edit-distance kernel instead of a per-batch host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.seq2seq import translation_loss
from ..ops.levenshtein import normalized_similarity
from .state import TrainState


def token_lengths(ids: jnp.ndarray, eos: int, pad: int) -> jnp.ndarray:
    """Length up to (excluding) the first eos; pads don't count."""
    is_end = (ids == eos) | (ids == pad)
    idx = jnp.argmax(is_end, axis=-1)
    has = jnp.any(is_end, axis=-1)
    return jnp.where(has, idx, ids.shape[-1]).astype(jnp.int32)


def make_fused_translation_train_step(
    stats, frame_len: int, aug_prob: float = 0.2,
    pad_idx: int = 0, eos_idx: int = 2, conf_weight: float = 0.1,
    with_grads: bool = False,
):
    """Raw-batch translation step: augment + preprocess fused on device, the
    flat [T, 276] output regrouped to [T, 92, 3] (the concat order is
    landmark-major, so a reshape recovers the grouped layout)."""
    from ..preprocess.augment import augment
    from ..preprocess.pipeline import frame_mask, preprocess

    base = make_translation_train_step(pad_idx, eos_idx, conf_weight,
                                       with_grads=with_grads)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        prep_rng = jax.random.fold_in(jax.random.fold_in(rng, 7), state.step)
        keys = jax.random.split(prep_rng, batch["raw"].shape[0])

        def prep(key, raw, length):
            raw, length = augment(key, raw, length, prob=aug_prob)
            return preprocess(raw, length, stats, frame_len)

        flat = jax.vmap(prep)(keys, batch["raw"], batch["lengths"])
        mask = frame_mask(flat)
        B, T, _ = flat.shape
        inner = {"x": flat.reshape(B, T, 92, 3), "mask": mask,
                 "tokens": batch["labels"]}
        return base(state, inner, rng)

    return step


def make_fused_translation_eval_step(stats, frame_len: int, model,
                                     max_len: int = 64,
                                     pad_idx: int = 0, eos_idx: int = 2):
    """Preprocess -> encoder once -> AR greedy decode, one program."""
    from ..decode.autoregressive import greedy_translate
    from ..preprocess.pipeline import frame_mask, preprocess

    def step(state: TrainState, batch: dict):
        flat = jax.vmap(
            lambda r, l: preprocess(r, l, stats, frame_len)
        )(batch["raw"], batch["lengths"])
        mask = frame_mask(flat)
        B, T, _ = flat.shape
        x = flat.reshape(B, T, 92, 3)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        tokens, confidence = greedy_translate(
            model, variables, x, mask, max_len=max_len, eos=eos_idx,
            pad=pad_idx)
        pred, _ = model.apply(variables, x, mask, batch["labels"][:, :-1],
                              training=False)
        tgt_out = batch["labels"][:, 1:]
        valid = tgt_out != pad_idx
        logp = jax.nn.log_softmax(pred, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_out[..., None], axis=-1)[..., 0]
        per_seq = (jnp.sum(nll * valid, axis=1)
                   / jnp.maximum(jnp.sum(valid, axis=1), 1))
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
        counts = jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32)
        return {"loss": loss, "loss_per_seq": per_seq, "ids": tokens,
                "counts": counts, "confidence": confidence}

    return step


def make_translation_train_step(pad_idx: int = 0, eos_idx: int = 2,
                                conf_weight: float = 0.1,
                                with_grads: bool = False):
    def step(state: TrainState, batch: dict, rng: jax.Array):
        """batch: x [B,T,92,3] grouped landmarks, mask [B,T], tokens [B,S]."""
        dropout_rng = jax.random.fold_in(rng, state.step)
        tokens = batch["tokens"]
        tgt_in, tgt_out = tokens[:, :-1], tokens[:, 1:]

        def loss_fn(params):
            (pred, confidence), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"], batch.get("mask"), tgt_in,
                training=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            # on-device confidence target (stop-grad, like the reference's
            # torch.no_grad block)
            pred_ids = jnp.argmax(jax.lax.stop_gradient(pred), axis=-1)
            sim = normalized_similarity(
                pred_ids, tgt_out,
                token_lengths(pred_ids, eos_idx, pad_idx),
                token_lengths(tgt_out, eos_idx, pad_idx),
            )
            loss = translation_loss(pred, tgt_out, confidence, sim,
                                    pad_idx=pad_idx, conf_weight=conf_weight)
            return loss, (updates["batch_stats"], confidence)

        (loss, (new_bs, confidence)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # shared guarded update: non-finite skip + Lookahead (state.py)
        from .state import _finish_step

        new_state, metrics = _finish_step(state, loss, grads, new_bs)
        metrics["confidence_mean"] = jnp.mean(confidence)
        if with_grads:
            metrics["grads"] = grads  # histogram variant (wandb.watch parity)
        return new_state, metrics

    return step
