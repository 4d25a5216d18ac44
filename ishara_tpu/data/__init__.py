from . import landmarks, vocab
from .dataset import ParquetASLFR, compute_group_stats, normalize_per_sequence
from .synthetic import SyntheticASLFR
from .tokenizer import CTCTokenizer, Seq2SeqTokenizer

__all__ = [
    "landmarks",
    "vocab",
    "ParquetASLFR",
    "SyntheticASLFR",
    "compute_group_stats",
    "normalize_per_sequence",
    "CTCTokenizer",
    "Seq2SeqTokenizer",
]
