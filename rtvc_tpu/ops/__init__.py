from .masking import create_padding_mask, create_causal_mask, create_casual_mask
from .attention import multi_head_attention, flash_attention
from .preprocess import clip_preprocess, CLIP_MEAN, CLIP_STD
from .layernorm import fused_layer_norm, FusedLayerNorm
from .quantization import QuantDense, int8_matmul, quantize_teacher_params

__all__ = [
    "create_padding_mask",
    "create_causal_mask",
    "create_casual_mask",
    "multi_head_attention",
    "flash_attention",
    "clip_preprocess",
    "CLIP_MEAN",
    "CLIP_STD",
    "fused_layer_norm",
    "FusedLayerNorm",
    "QuantDense",
    "int8_matmul",
    "quantize_teacher_params",
]
