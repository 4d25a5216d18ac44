from .autoregressive import greedy_translate
from .beam import beam_decode_batch, ctc_beam_search
from .greedy import greedy_decode, greedy_decode_batch

__all__ = [
    "greedy_translate",
    "beam_decode_batch",
    "ctc_beam_search",
    "greedy_decode",
    "greedy_decode_batch",
]
