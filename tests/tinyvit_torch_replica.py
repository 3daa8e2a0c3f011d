"""Pure-torch TinyViT replica: the encoder's independent numeric oracle.

Mirrors the architecture timm's ``tiny_vit_21m_224`` implements (Wu et al.,
ECCV 2022 — the reference's student encoder, reference src/models/model.py:
35-47 / config.py:77) with timm's exact state-dict key names, so a REAL
downloaded checkpoint (or tests' ``_fake_tinyvit_sd``) loads directly via
``load_state_dict``. Used two ways:

- tests: fake-checkpoint forward parity against the JAX TinyViT
  (tests/test_convert.py) — catches converter transposes/mis-mappings
  (relative-position-bias tables, window partition order, BN folding)
  without any network;
- scripts/bringup_real_weights.py ``tinyvit-parity`` stage: the same
  comparison on the real timm checkpoint, per-stage tolerance asserts +
  recorded goldens (VERDICT r4 #2 — the encoder used to be validated by
  key/shape only).

Inference-only (eval semantics): no dropout, no drop-path. NCHW like timm;
callers transpose to compare with the NHWC JAX maps.
"""

from __future__ import annotations

import math
from typing import List

import torch
from torch import nn


class Conv2dBN(nn.Module):
    def __init__(self, cin: int, cout: int, k: int = 1, stride: int = 1,
                 groups: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, k // 2, groups=groups,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-5)

    def forward(self, x):
        return self.bn(self.conv(x))


class PatchEmbed(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.conv1 = Conv2dBN(3, dim // 2, 3, 2)
        self.conv2 = Conv2dBN(dim // 2, dim, 3, 2)

    def forward(self, x):
        return self.conv2(torch.nn.functional.gelu(self.conv1(x)))


class MBConv(nn.Module):
    def __init__(self, dim: int, expand_ratio: float):
        super().__init__()
        hidden = int(dim * expand_ratio)
        self.conv1 = Conv2dBN(dim, hidden, 1)
        self.conv2 = Conv2dBN(hidden, hidden, 3, groups=hidden)
        self.conv3 = Conv2dBN(hidden, dim, 1)

    def forward(self, x):
        shortcut = x
        x = torch.nn.functional.gelu(self.conv1(x))
        x = torch.nn.functional.gelu(self.conv2(x))
        x = self.conv3(x)
        return torch.nn.functional.gelu(shortcut + x)


class PatchMerging(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv1 = Conv2dBN(cin, cout, 1)
        self.conv2 = Conv2dBN(cout, cout, 3, 2, groups=cout)
        self.conv3 = Conv2dBN(cout, cout, 1)

    def forward(self, x):
        x = torch.nn.functional.gelu(self.conv1(x))
        x = torch.nn.functional.gelu(self.conv2(x))
        return self.conv3(x)


def attention_bias_idxs(window: int) -> torch.Tensor:
    """(q, k) -> per-|offset| bias slot, first-seen order (the layout the
    JAX model and timm both produce for a square window)."""
    points = [(i, j) for i in range(window) for j in range(window)]
    offsets = {}
    idxs = torch.zeros(len(points), len(points), dtype=torch.long)
    for qi, (qx, qy) in enumerate(points):
        for ki, (kx, ky) in enumerate(points):
            off = (abs(qx - kx), abs(qy - ky))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs[qi, ki] = offsets[off]
    return idxs


class Attention(nn.Module):
    """LeViT-style window attention with learned per-offset biases."""

    def __init__(self, dim: int, num_heads: int, window: int):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = dim // num_heads
        self.scale = self.key_dim ** -0.5
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.qkv = nn.Linear(dim, num_heads * self.key_dim * 3)
        self.proj = nn.Linear(num_heads * self.key_dim, dim)
        idxs = attention_bias_idxs(window)
        self.register_buffer("attention_bias_idxs", idxs, persistent=False)
        self.attention_biases = nn.Parameter(
            torch.zeros(num_heads, int(idxs.max()) + 1))

    def forward(self, x):  # [B*, N, C]
        bw, n, _ = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(bw, n, self.num_heads, 3, self.key_dim)
        q, k, v = (qkv[..., i, :].permute(0, 2, 1, 3) for i in range(3))
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(bw, n, -1)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(self.norm(x))))


class TinyVitBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, window: int,
                 mlp_ratio: float, fmap: int):
        super().__init__()
        self.window = min(window, fmap)
        self.attn = Attention(dim, num_heads, self.window)
        self.local_conv = Conv2dBN(dim, dim, 3, groups=dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):  # NCHW
        b, c, h, w = x.shape
        win = self.window
        shortcut = x
        ph, pw = (win - h % win) % win, (win - w % win) % win
        xp = torch.nn.functional.pad(x, (0, pw, 0, ph))
        hh, ww = h + ph, w + pw
        # NCHW -> [B * nWin, win*win, C] in the same scan order as the
        # reshape/transpose partition in the JAX model
        xw = xp.view(b, c, hh // win, win, ww // win, win)
        xw = xw.permute(0, 2, 4, 3, 5, 1).reshape(-1, win * win, c)
        aw = self.attn(xw)
        aw = aw.view(b, hh // win, ww // win, win, win, c)
        aw = aw.permute(0, 5, 1, 3, 2, 4).reshape(b, c, hh, ww)
        x = shortcut + aw[:, :, :h, :w]
        x = self.local_conv(x)
        xt = x.flatten(2).transpose(1, 2)          # [B, HW, C]
        xt = xt + self.mlp(xt)
        return xt.transpose(1, 2).view(b, c, h, w)


class TinyViTTorch(nn.Module):
    """features_only TinyViT: returns the four stage maps, NCHW."""

    def __init__(self, embed_dims=(96, 192, 384, 576), depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 18), window_sizes=(7, 7, 14, 7),
                 mlp_ratio: float = 4.0, mbconv_expand_ratio: float = 4.0,
                 input_size: int = 224):
        super().__init__()
        self.patch_embed = PatchEmbed(embed_dims[0])
        fmaps = [input_size // 4 // (2 ** s) for s in range(4)]
        stages = []
        stage0 = nn.ModuleDict({"blocks": nn.ModuleList(
            [MBConv(embed_dims[0], mbconv_expand_ratio)
             for _ in range(depths[0])])})
        stages.append(stage0)
        for s in range(1, 4):
            stages.append(nn.ModuleDict({
                "downsample": PatchMerging(embed_dims[s - 1], embed_dims[s]),
                "blocks": nn.ModuleList(
                    [TinyVitBlock(embed_dims[s], num_heads[s],
                                  window_sizes[s], mlp_ratio, fmaps[s])
                     for _ in range(depths[s])]),
            }))
        self.stages = nn.ModuleList(stages)

    def forward(self, x) -> List[torch.Tensor]:
        x = self.patch_embed(x)
        maps = []
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = stage["downsample"](x)
            for blk in stage["blocks"]:
                x = blk(x)
            maps.append(x)
        return maps

    def load_timm_state_dict(self, sd, strict_ours: bool = True):
        """Load a timm checkpoint: ignore timm-only extras (head,
        norm_head, attention_bias_idxs buffers), but require every one of
        OUR parameters/buffers to be filled. When the checkpoint carries
        its own attention_bias_idxs, assert they equal ours — a mismatch
        means the bias-table layout assumption is wrong (exactly the
        silent-transpose class of bug this oracle exists to catch)."""
        own = dict(self.state_dict())
        filled, missing = {}, []
        for k in own:
            if k.endswith("attention_bias_idxs"):
                continue  # non-persistent, recomputed
            if k.endswith("num_batches_tracked"):
                continue  # BN step counter; irrelevant in eval mode
            if k in sd:
                filled[k] = torch.as_tensor(sd[k])
            else:
                missing.append(k)
        if strict_ours and missing:
            raise KeyError(f"checkpoint missing {len(missing)} keys, "
                           f"e.g. {missing[:5]}")
        for k, v in sd.items():
            if k.endswith("attention_bias_idxs") and k in own:
                if not torch.equal(torch.as_tensor(v).long(),
                                   own[k].long()):
                    raise ValueError(f"{k}: checkpoint bias-index layout "
                                     "differs from the computed one")
        self.load_state_dict(filled, strict=False)
        self.eval()
        return missing
