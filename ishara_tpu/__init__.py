"""Ishara-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for ASL
fingerspelling recognition, with the capabilities of tanmayrainanda/ishara.

Public API mirrors the reference's entry points (``get_model``, tokenizers,
preprocessing, CTC loss/decode, Trainer) re-designed TPU-first. See SURVEY.md
for the capability map.
"""

from .data.vocab import NUM_CLASSES, PAD_TOKEN, PAD_TOKEN_IDX
from .data.tokenizer import CTCTokenizer, Seq2SeqTokenizer
from .data.landmarks import FRAME_LEN, MAX_PHRASE_LENGTH, N_COLS, SEL_COLS

__version__ = "0.1.0"

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
]
