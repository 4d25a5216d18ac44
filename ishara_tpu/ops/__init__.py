from .ctc import ctc_loss
from .ctc_kernel import ctc_loss_kernel
from .dropout import fast_dropout, fast_dropout_add, tpu_dropout, tpu_dropout_add

__all__ = [
    "ctc_loss",
    "ctc_loss_kernel",
    "fast_dropout",
    "fast_dropout_add",
    "tpu_dropout",
    "tpu_dropout_add",
]
