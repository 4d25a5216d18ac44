from .optim import lrfn_schedule, make_optimizer, onecycle_schedule
from .state import TrainState, ctc_eval_step, ctc_train_step

__all__ = [
    "lrfn_schedule",
    "make_optimizer",
    "onecycle_schedule",
    "TrainState",
    "ctc_eval_step",
    "ctc_train_step",
]
