"""TinyViT image encoder (the student's frame encoder), from scratch in JAX.

The reference wrapped ``timm.create_model('tiny_vit_21m_224...',
features_only=True)`` (reference src/models/model.py:35-47) and consumed the
four stage feature maps (stage 1 convolutional, stages 2-4 attention;
model.py:124-133). This is a TPU-first reimplementation of the TinyViT
architecture (Wu et al., ECCV 2022):

- NHWC layout throughout (TPU-native convolutions);
- window attention runs through ``ops.multi_head_attention`` with the
  LeViT-style learned relative-position bias table as an additive bias;
- window partitioning is pure reshape/transpose (no gather);
- BatchNorm carries running statistics in the ``batch_stats`` collection;
- returns all four stage feature maps [B, H_s, W_s, C_s] (features_only
  semantics) so the student can distill stage means against teacher CLS
  tokens (reference model.py:908-917).

Checkpoint conversion from timm's ``tiny_vit_21m_224`` lives in
``models/convert.py`` (name-mapped; verified shape-exact in tests).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import depthwise
from ..ops.attention import multi_head_attention
from .layers import DropPath, Mlp


@dataclasses.dataclass(frozen=True)
class TinyViTConfig:
    embed_dims: Tuple[int, ...] = (96, 192, 384, 576)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 18)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    drop_path_rate: float = 0.2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # tanh-approximated GELU instead of exact erf. timm's TinyViT uses the
    # exact form, so converted checkpoints default to False for parity;
    # measured A/B at the training shape is in docs/PERF.md §1b (the erf
    # GELUs ride elementwise on 58M-element stage-0 tensors).
    gelu_approximate: bool = False


def tiny_vit_21m_config(**overrides) -> TinyViTConfig:
    """tiny_vit_21m_224 hyperparameters (the reference's student encoder)."""
    return dataclasses.replace(TinyViTConfig(), **overrides)


def tiny_vit_5m_config(**overrides) -> TinyViTConfig:
    cfg = TinyViTConfig(embed_dims=(64, 128, 160, 320), depths=(2, 2, 6, 2),
                        num_heads=(2, 4, 5, 10), window_sizes=(7, 7, 14, 7),
                        drop_path_rate=0.0)
    return dataclasses.replace(cfg, **overrides)


class _DWConv3x3(nn.Module):
    """Stride-1 depthwise 3x3 via ops.depthwise.depthwise_conv3x3 (custom
    one-pass wgrad). Param layout/init identical to the nn.Conv it
    replaces: kernel HWIO [3, 3, 1, C], lecun_normal."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features))
        return depthwise.depthwise_conv3x3(
            x.astype(self.dtype), kernel.astype(self.dtype))


class ConvBN(nn.Module):
    """Conv2d (no bias) + BatchNorm, the TinyViT Conv2dBN unit."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        if (self.kernel == 3 and self.stride == 1
                and self.groups == self.features
                and depthwise.USE_DW_WGRAD_PALLAS):
            # custom-VJP depthwise path (one-pass wgrad, ops/depthwise.py);
            # same param tree as nn.Conv (conv/kernel, HWIO [3,3,1,C]) so
            # checkpoints are interchangeable with the flag off
            x = _DWConv3x3(self.features, self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x


class MBConv(nn.Module):
    """Inverted-residual conv block (stage 1 of TinyViT)."""

    dim: int
    expand_ratio: float
    drop_path: float
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.dim * self.expand_ratio)
        shortcut = x
        x = ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = ConvBN(hidden, 3, groups=hidden, dtype=self.dtype,
                   name="conv2")(x, train)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = ConvBN(self.dim, 1, dtype=self.dtype, name="conv3")(x, train)
        x = DropPath(self.drop_path)(x, deterministic=not train)
        x = shortcut + x
        return nn.gelu(x, approximate=self.gelu_approx)


class PatchEmbed(nn.Module):
    """Two stride-2 ConvBN+GELU stems: 224 → 56, 3 → embed_dims[0]."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.dim // 2, 3, 2, dtype=self.dtype, name="conv1")(x, train)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = ConvBN(self.dim, 3, 2, dtype=self.dtype, name="conv2")(x, train)
        return x


class PatchMerging(nn.Module):
    """Stage-transition downsample: 1x1 expand → 3x3 s2 depthwise → 1x1."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, train)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = ConvBN(self.out_dim, 3, 2, groups=self.out_dim, dtype=self.dtype,
                   name="conv2")(x, train)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, train)
        return x


def _attention_bias_idxs(window: int) -> np.ndarray:
    """Map each (query, key) offset pair in a window to a unique bias index."""
    points = [(i, j) for i in range(window) for j in range(window)]
    offsets = {}
    idxs = np.zeros((window * window, window * window), np.int32)
    for qi, (qx, qy) in enumerate(points):
        for ki, (kx, ky) in enumerate(points):
            off = (abs(qx - kx), abs(qy - ky))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs[qi, ki] = offsets[off]
    return idxs


class WindowAttention(nn.Module):
    """LeViT-style attention with learned per-offset biases (TinyViT Attention).

    Operates on [B*, N, C] windows; key_dim = C // heads, attn_ratio = 1.
    The input LayerNorm lives inside (TinyViT keeps norms in submodules).
    """

    dim: int
    num_heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[1]
        key_dim = self.dim // self.num_heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(self.num_heads * key_dim * 3, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(x.shape[0], n, self.num_heads, 3, key_dim)
        q, k, v = (qkv[..., i, :].transpose(0, 2, 1, 3) for i in range(3))

        idxs = _attention_bias_idxs(self.window)
        num_offsets = int(idxs.max()) + 1
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, num_offsets))
        bias = biases[:, jnp.asarray(idxs)]  # [H, N, N]

        # softmax in compute dtype: at bf16 this removes the f32
        # score-tensor cost that dominated the window core (PERF.md §1b);
        # f32 runs (parity tests, CPU) are unchanged by construction.
        out = multi_head_attention(q, k, v, bias=bias[None].astype(jnp.float32),
                                   scale=key_dim ** -0.5,
                                   softmax_in_input_dtype=True)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], n, -1)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention + depthwise local conv + MLP (one stage-2..4 block)."""

    dim: int
    num_heads: int
    window: int
    mlp_ratio: float
    drop_path: float
    dropout: float
    dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        shortcut = x

        # pad to window multiples, partition windows as pure reshapes
        ph = (win - h % win) % win
        pw = (win - w % win) % win
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hh, ww = h + ph, w + pw
        xw = xp.reshape(b, hh // win, win, ww // win, win, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)

        attn = WindowAttention(self.dim, self.num_heads, win,
                               dtype=self.dtype, name="attn")(xw)

        attn = attn.reshape(b, hh // win, ww // win, win, win, c)
        attn = attn.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
        attn = attn[:, :h, :w]
        x = shortcut + DropPath(self.drop_path)(attn, deterministic=not train)

        # local depthwise conv (TinyViT local_conv, 3x3 groups=dim)
        x = ConvBN(self.dim, 3, groups=self.dim, dtype=self.dtype,
                   name="local_conv")(x, train)

        # MLP on token view
        xt = x.reshape(b, h * w, c)
        mlp = Mlp(int(self.dim * self.mlp_ratio), dropout=self.dropout,
                  dtype=self.dtype, gelu_approx=self.gelu_approx,
                  name="mlp")(xt, deterministic=not train)
        xt = xt + DropPath(self.drop_path)(mlp, deterministic=not train)
        return xt.reshape(b, h, w, c)


class TinyViT(nn.Module):
    """Four-stage TinyViT feature extractor (features_only semantics)."""

    config: TinyViTConfig = tiny_vit_21m_config()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        cfg = self.config
        x = x.astype(cfg.dtype)
        x = PatchEmbed(cfg.embed_dims[0], dtype=cfg.dtype,
                       gelu_approx=cfg.gelu_approximate,
                       name="patch_embed")(x, train)

        total_blocks = sum(cfg.depths)
        dp_rates = np.linspace(0, cfg.drop_path_rate, total_blocks)
        block_idx = 0
        feature_maps: List[jnp.ndarray] = []

        # stage 0: MBConv blocks
        for d in range(cfg.depths[0]):
            x = MBConv(cfg.embed_dims[0], cfg.mbconv_expand_ratio,
                       float(dp_rates[block_idx]), dtype=cfg.dtype,
                       gelu_approx=cfg.gelu_approximate,
                       name=f"stage0_block{d}")(x, train)
            block_idx += 1
        feature_maps.append(x)

        # stages 1-3: PatchMerging downsample then TinyViT blocks
        for s in range(1, 4):
            x = PatchMerging(cfg.embed_dims[s], dtype=cfg.dtype,
                             gelu_approx=cfg.gelu_approximate,
                             name=f"stage{s}_downsample")(x, train)
            for d in range(cfg.depths[s]):
                x = TinyViTBlock(cfg.embed_dims[s], cfg.num_heads[s],
                                 cfg.window_sizes[s], cfg.mlp_ratio,
                                 float(dp_rates[block_idx]), cfg.dropout,
                                 dtype=cfg.dtype,
                                 gelu_approx=cfg.gelu_approximate,
                                 name=f"stage{s}_block{d}")(x, train)
                block_idx += 1
            feature_maps.append(x)

        return feature_maps


def stage_means(feature_maps: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Spatial mean of each stage map: [B, H, W, C] → [B, C]
    (reference model.py:129 took mean over dims [2, 3] of NCHW)."""
    return [jnp.mean(f, axis=(1, 2)) for f in feature_maps]
