from .blocks import Conv1DBlock, ConformerBlock, SqueezeformerBlock, TransformerBlock
from .encoder import IsharaEncoder, build_model, get_model
from .layers import (
    CausalDWConv1D,
    ECA,
    FeedForwardModule,
    MultiHeadSelfAttention,
    SqueezeExcite,
    positional_encoding,
)

__all__ = [
    "Conv1DBlock",
    "ConformerBlock",
    "SqueezeformerBlock",
    "TransformerBlock",
    "IsharaEncoder",
    "build_model",
    "get_model",
    "CausalDWConv1D",
    "ECA",
    "FeedForwardModule",
    "MultiHeadSelfAttention",
    "SqueezeExcite",
    "positional_encoding",
]
