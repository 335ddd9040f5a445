from .positional_encoding import SinePositionalEncoding
from .transformer import FFN, MultiheadAttention, MLP

__all__ = ["SinePositionalEncoding", "FFN", "MultiheadAttention", "MLP"]
