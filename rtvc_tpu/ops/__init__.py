from .masking import create_padding_mask, create_causal_mask, create_casual_mask
from .attention import multi_head_attention, flash_attention
from .preprocess import clip_preprocess, CLIP_MEAN, CLIP_STD

__all__ = [
    "create_padding_mask",
    "create_causal_mask",
    "create_casual_mask",
    "multi_head_attention",
    "flash_attention",
    "clip_preprocess",
    "CLIP_MEAN",
    "CLIP_STD",
]
