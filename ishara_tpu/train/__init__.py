from .checkpoint import CheckpointManager
from .optim import lrfn_schedule, make_optimizer, onecycle_schedule
from .state import (
    TrainState,
    ctc_eval_step,
    ctc_train_step,
    make_fused_ctc_eval_step,
    make_fused_ctc_train_step,
)
from .trainer import Trainer

__all__ = [
    "CheckpointManager",
    "Trainer",
    "make_fused_ctc_eval_step",
    "make_fused_ctc_train_step",
    "lrfn_schedule",
    "make_optimizer",
    "onecycle_schedule",
    "TrainState",
    "ctc_eval_step",
    "ctc_train_step",
]
