"""CLIP ViT image tower (the GIT teacher's frame encoder), in JAX.

The reference obtained this through the ``generativeimage2text`` package:
``get_image_encoder('CLIPViT_L_14', input_resolution=224)`` (reference
src/models/model.py:682-685) — OpenAI CLIP's visual transformer modified by
GIT to return the FULL token grid (257 tokens = 1 CLS + 16x16 patches) after
the final LayerNorm, without the contrastive projection
(``visual_feature_size: 1024``, teacher parameter.yaml).

Architecture (ViT-L/14): 14x14 stride-14 patch conv (no bias) → prepend CLS
embedding → add learned positional embedding → ln_pre → 24 pre-LN residual
attention blocks (width 1024, 16 heads, MLP 4x with QuickGELU) → ln_post over
all tokens.

TPU-first notes: NHWC patch conv; attention via ``ops.multi_head_attention``
(Pallas fused kernel on TPU, 257-token sequences); block outputs at requested
indices are returned explicitly — the reference used forward hooks at
resblocks [0, 6, 12, 18] (model.py:844-847) to harvest CLS activations for
the feature-map distillation loss.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.layernorm import FusedAddLayerNorm, FusedLayerNorm
from ..ops.quantization import QuantDense


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False  # W8A8 Denses (frozen-teacher inference only)


def clip_vit_l14_config(**overrides) -> CLIPViTConfig:
    return dataclasses.replace(CLIPViTConfig(), **overrides)


def clip_vit_b16_config(**overrides) -> CLIPViTConfig:
    """CLIP ViT-B/16 @224: 197 tokens x 768 (GIT-base's encoder — the
    reference factory's default, model.py:682-683)."""
    cfg = CLIPViTConfig(patch_size=16, width=768, layers=12, heads=12)
    return dataclasses.replace(cfg, **overrides)


# reference image_encoder_type strings (model.py:682, parameter.yaml)
IMAGE_ENCODERS = {
    "CLIPViT_L_14": clip_vit_l14_config,
    "CLIPViT_B_16": clip_vit_b16_config,
}


def get_image_encoder(encoder_type: str = "CLIPViT_B_16",
                      input_resolution: int = 224,
                      **overrides) -> "CLIPViT":
    """Factory mirroring generativeimage2text's ``get_image_encoder``
    (used at reference model.py:682-685)."""
    if encoder_type not in IMAGE_ENCODERS:
        raise ValueError(f"unknown image encoder {encoder_type!r}; "
                         f"known: {sorted(IMAGE_ENCODERS)}")
    cfg = IMAGE_ENCODERS[encoder_type](image_size=input_resolution,
                                       **overrides)
    return CLIPViT(cfg)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import attention as attention_ops

        dense = QuantDense if self.quantized else nn.Dense
        b, l, _ = x.shape
        qkv = dense(3 * self.width, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if attention_ops.USE_BLHD_CLIP and attention_ops._on_tpu():
            # layout-native kernel: consume the QKV GEMM's [B, L, H, D]
            # without the transpose XLA would otherwise have to
            # materialize around an opaque pallas_call (ROADMAP #7 A/B)
            def fold(t):
                return t.reshape(b, l, self.heads, -1)
            out = attention_ops.blhd_attention(fold(q), fold(k), fold(v))
            out = out.reshape(b, l, self.width)
        else:
            def heads(t):
                return t.reshape(b, l, self.heads, -1).transpose(0, 2, 1, 3)
            out = multi_head_attention(heads(q), heads(k), heads(v))
            out = out.transpose(0, 2, 1, 3).reshape(b, l, self.width)
        return dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP (CLIP resblock)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = QuantDense if self.quantized else nn.Dense
        h = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        attn_out = CLIPAttention(self.width, self.heads, self.dtype,
                                 self.quantized, name="attn")(h)
        # fused residual-add + pre-LN: the sum feeds the mlp residual AND
        # the norm feeds the mlp input — one HBM pass for both on TPU
        # (ops/layernorm.py; same 'ln_2' param tree as the plain module)
        x, h = FusedAddLayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="ln_2")(x, attn_out)
        h = dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPViT(nn.Module):
    """CLIP visual transformer returning the full token grid.

    ``__call__(x, block_indices)`` → (tokens [B, 257, width],
    [block outputs [B, 257, width] at each requested index]).
    """

    config: CLIPViTConfig = clip_vit_l14_config()

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 block_indices: Optional[Sequence[int]] = None
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        cfg = self.config
        x = x.astype(cfg.dtype)
        if x.shape[1] == 3 and x.shape[-1] != 3:  # NCHW → NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        b = x.shape[0]
        grid = cfg.image_size // cfg.patch_size

        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, dtype=cfg.dtype, name="conv1")(x)
        x = x.reshape(b, grid * grid, cfg.width)

        cls_emb = self.param("class_embedding",
                             nn.initializers.normal(cfg.width ** -0.5),
                             (cfg.width,))
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(cfg.width ** -0.5),
                             (grid * grid + 1, cfg.width))
        cls_tok = jnp.broadcast_to(cls_emb.astype(cfg.dtype),
                                   (b, 1, cfg.width))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos_emb.astype(cfg.dtype)[None]
        x = FusedLayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_pre")(x)

        wanted = set(block_indices or [])
        taps: List[jnp.ndarray] = []
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, cfg.dtype,
                                       cfg.quantized,
                                       name=f"resblock_{i}")(x)
            if i in wanted:
                taps.append(x)

        x = FusedLayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_post")(x)
        return x, taps
