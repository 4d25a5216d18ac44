from .ctc import ctc_loss
from .dropout import fast_dropout, tpu_dropout

__all__ = ["ctc_loss", "fast_dropout", "tpu_dropout"]
