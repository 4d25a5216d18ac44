from .autoregressive import greedy_translate
from .beam import beam_decode_batch, ctc_beam_search
from .beam_device import beam_decode_device_batch, beam_search_device
from .greedy import greedy_decode, greedy_decode_batch

__all__ = [
    "greedy_translate",
    "beam_decode_device_batch",
    "beam_search_device",
    "beam_decode_batch",
    "ctc_beam_search",
    "greedy_decode",
    "greedy_decode_batch",
]
