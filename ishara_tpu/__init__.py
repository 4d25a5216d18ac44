"""Ishara-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for ASL
fingerspelling recognition, with the capabilities of tanmayrainanda/ishara.

Public API mirrors the reference's entry points (``get_model``, tokenizers,
preprocessing, CTC loss/decode, Trainer) re-designed TPU-first. See SURVEY.md
for the capability map.
"""

from .data.vocab import NUM_CLASSES, PAD_TOKEN, PAD_TOKEN_IDX
from .data.tokenizer import CTCTokenizer, Seq2SeqTokenizer
from .data.landmarks import FRAME_LEN, MAX_PHRASE_LENGTH, N_COLS, SEL_COLS
from .config import EncoderConfig, IsharaConfig, TrainConfig, baseline_config

__version__ = "0.1.0"


def get_model(*args, **kwargs):
    """Lazy re-export of :func:`ishara_tpu.models.get_model` (the reference
    README API)."""
    from .models import get_model as _gm

    return _gm(*args, **kwargs)


__all__ = [
    "NUM_CLASSES",
    "PAD_TOKEN",
    "PAD_TOKEN_IDX",
    "CTCTokenizer",
    "Seq2SeqTokenizer",
    "FRAME_LEN",
    "MAX_PHRASE_LENGTH",
    "N_COLS",
    "SEL_COLS",
    "EncoderConfig",
    "IsharaConfig",
    "TrainConfig",
    "baseline_config",
    "get_model",
]
