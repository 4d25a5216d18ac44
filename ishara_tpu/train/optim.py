"""Optimizers and schedules.

Reference contracts:

* ``lrfn`` (nb cell 11): exponential warmup ``lr_max * 2^-(warmup-epoch)``
  then half-cosine decay to 0, stepped **per epoch**.
* ``WeightDecayCallback``: decoupled weight decay re-coupled to the LR each
  epoch as ``wd = lr * 0.05``.
* Optimizer: RectifiedAdam(sma_threshold=4) wrapped in Lookahead(sync=5)
  (nb cell 7); the torch path uses AdamW + OneCycleLR (integration.py:692).

TPU-native: the coupling ``wd = lr * wd_ratio`` falls out of ordering
``add_decayed_weights(wd_ratio)`` *before* ``scale_by_learning_rate`` —
update = -lr·(dir + ratio·p) = -lr·dir - (lr·ratio)·p. Lookahead is applied
at the train-state level (see trainer) so the whole step stays one jitted
program with a `where` instead of optax's wrapper state.
"""

from __future__ import annotations

import math

import optax

from ..config import TrainConfig


def lrfn_schedule(
    lr_max: float,
    warmup_epochs: int,
    num_epochs: int,
    steps_per_epoch: int,
    num_cycles: float = 0.5,
    warmup_method: str = "exp",
):
    """Per-epoch ``lrfn`` lifted to a per-step optax schedule."""

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // steps_per_epoch
        if warmup_method == "log":
            warm = lr_max * 0.10 ** (warmup_epochs - epoch)
        else:
            warm = lr_max * 2.0 ** -(warmup_epochs - epoch)
        progress = (epoch - warmup_epochs) / max(1, num_epochs - warmup_epochs)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        ) * lr_max
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def onecycle_schedule(lr_max: float, total_steps: int):
    """Torch-path OneCycleLR equivalent (integration.py:694-700)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=lr_max
    )


def make_optimizer(cfg: TrainConfig):
    """Returns (tx, schedule). ``tx`` excludes Lookahead (train-state level)."""
    total_steps = cfg.num_epochs * cfg.steps_per_epoch
    if cfg.optimizer in ("radam_lookahead", "radam"):
        schedule = lrfn_schedule(
            cfg.lr_max, cfg.warmup_epochs, cfg.num_epochs, cfg.steps_per_epoch
        )
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.scale_by_radam(threshold=cfg.radam_sma_threshold),
            optax.add_decayed_weights(cfg.wd_ratio),
            optax.scale_by_learning_rate(schedule),
        )
    elif cfg.optimizer == "adamw":
        schedule = onecycle_schedule(cfg.lr_max, total_steps)
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.scale_by_adam(),
            optax.add_decayed_weights(cfg.wd_ratio),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise ValueError(cfg.optimizer)
    return tx, schedule
