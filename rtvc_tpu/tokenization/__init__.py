from .wordpiece import BertWordPieceTokenizer, encode_caption
from .vocab import load_vocab, build_synthetic_vocab

__all__ = [
    "BertWordPieceTokenizer",
    "encode_caption",
    "load_vocab",
    "build_synthetic_vocab",
]
