"""GIT-Large teacher: CLIP ViT-L/14 frames + BERT-style joint text decoder.

Rebuilds the teacher the reference assembled from the ``generativeimage2text``
package (reference src/models/model.py:343-462, 681-793):

- 6 frames run through CLIP ViT-L/14 as ONE batch (model.py:378), each
  frame's 257 tokens get a learned per-frame temporal embedding added
  (``img_temperal_embedding``, model.py:379-380), then all frames concat to
  1542 visual tokens of width 1024;
- ``TransformerDecoderTextualHead`` (model.py:687-700): visual projection
  'linearLn' (Dense 1024→768 + LayerNorm), BERT text embeddings (word +
  position + LayerNorm + dropout), 6 post-norm BERT layers (hidden 768,
  12 heads, ffn 3072, GELU) running JOINT self-attention over
  [visual; text] with a prefix-causal mask (visual tokens see each other;
  text tokens see all visual + causally-previous text), and a final
  Dense(768 → 30522) logit head over the text positions;
- ``forward_output_logits`` (model.py:747-760): teacher-forced logits +
  visual features + per-layer decoder hidden states, computed for the WHOLE
  batch at once (the reference looped per sample in Python — a major GPU
  underutilization; here it is one batched XLA program);
- per-layer hidden states and encoder block taps are explicit outputs
  (the reference used forward hooks, model.py:844-857).

The joint attention uses the Pallas fused kernel with ``prefix_len = 1542``
— the 1542-token context is exactly the workload the kernel's single-pass
VMEM-resident design targets.

Weight conversion from the reference's ``model.pt`` lives in
``models/convert.py``. Structural assumptions that must match for converted
weights to reproduce teacher outputs (verified against the GIT paper /
published architecture, to be parity-tested when real weights are present):
BertSelfAttention QKV per-head layout, post-norm residual order, GELU (not
QuickGELU) in the text decoder, learned position embeddings starting at 0
for text and none for visual tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.layernorm import FusedLayerNorm
from ..ops.quantization import QuantDense
from .clip_vit import CLIPViT, CLIPViTConfig, clip_vit_l14_config

Cache = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class GITConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 6
    attention_heads: int = 12
    feedforward_size: int = 3072
    visual_feature_size: int = 1024
    max_caption_length: int = 1024
    num_image_with_embedding: int = 6
    dropout: float = 0.1
    clip: CLIPViTConfig = clip_vit_l14_config()
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False  # W8A8 textual-head Denses (frozen inference)


class BertLayer(nn.Module):
    """Post-norm BERT layer with joint prefix-causal self-attention."""

    hidden: int
    heads: int
    ffn: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    def setup(self):
        dense = QuantDense if self.quantized else nn.Dense
        # One fused QKV GEMM (not HF BERT's three separate Denses): a single
        # [L, H] x [H, 3H] matmul keeps the MXU busy with one large tile
        # sweep instead of three small ones and reads x from HBM once.
        # convert.py packs torch query|key|value into this column order.
        self.qkv = dense(3 * self.hidden, dtype=self.dtype)
        self.attn_out = dense(self.hidden, dtype=self.dtype)
        self.attn_norm = FusedLayerNorm(epsilon=1e-12, dtype=self.dtype)
        self.inter = dense(self.ffn, dtype=self.dtype)
        self.out = dense(self.hidden, dtype=self.dtype)
        self.out_norm = FusedLayerNorm(epsilon=1e-12, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _heads(self, t: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = t.shape
        return t.reshape(b, l, self.heads, -1).transpose(0, 2, 1, 3)

    def _merge(self, t: jnp.ndarray) -> jnp.ndarray:
        b, h, l, d = t.shape
        return t.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(self, x: jnp.ndarray, *, prefix_len: int,
                 kv_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        qp, kp, vp = jnp.split(self.qkv(x), 3, axis=-1)
        q, k, v = self._heads(qp), self._heads(kp), self._heads(vp)
        ctx = multi_head_attention(q, k, v, causal=True,
                                   prefix_len=prefix_len, kv_mask=kv_mask)
        h = self.attn_out(self._merge(ctx))
        h = self.drop(h, deterministic=deterministic)
        x = self.attn_norm(x + h)
        f = nn.gelu(self.inter(x), approximate=False)
        f = self.out(f)
        f = self.drop(f, deterministic=deterministic)
        return self.out_norm(x + f)

    # ---- incremental decoding --------------------------------------------
    def init_cache(self, visual: jnp.ndarray, max_text: int) -> Cache:
        """Prefill the cache with projected visual K/V (length P), reserving
        ``max_text`` slots for text tokens."""
        b, p, _ = visual.shape
        head_dim = self.hidden // self.heads
        _, k_p, v_p = jnp.split(self.qkv(visual), 3, axis=-1)
        k_vis, v_vis = self._heads(k_p), self._heads(v_p)
        pad = jnp.zeros((b, self.heads, max_text, head_dim), self.dtype)
        return {
            "k": jnp.concatenate([k_vis, pad], axis=2),
            "v": jnp.concatenate([v_vis, pad], axis=2),
        }

    def decode_step(self, x: jnp.ndarray, cache: Cache, text_index: jnp.ndarray,
                    prefix_len: int, hidden_in_cache_order: bool = True
                    ) -> Tuple[jnp.ndarray, Cache]:
        """x: [B, 1, hidden] text token at text position ``text_index``."""
        q_p, k_p, v_p = jnp.split(self.qkv(x), 3, axis=-1)
        q, k_new, v_new = self._heads(q_p), self._heads(k_p), self._heads(v_p)
        slot = prefix_len + text_index
        k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k_new, slot, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v_new, slot, axis=2)
        valid = (jnp.arange(k.shape[2]) <= slot)[None, :]
        ctx = multi_head_attention(q, k, v, kv_mask=valid, use_pallas=False)
        h = self.attn_out(self._merge(ctx))
        x = self.attn_norm(x + h)
        f = nn.gelu(self.inter(x), approximate=False)
        x = self.out_norm(x + self.out(f))
        return x, {"k": k, "v": v}


class TextualHead(nn.Module):
    """GIT's TransformerDecoderTextualHead (reference model.py:687-700)."""

    config: GITConfig

    def setup(self):
        cfg = self.config
        dense = QuantDense if cfg.quantized else nn.Dense
        self.visual_projection = dense(cfg.hidden_size, dtype=cfg.dtype,
                                       name="visual_projection")
        # eps 1e-5: the reference's 'linearLn' projection is
        # nn.Sequential(Linear, nn.LayerNorm(hidden)) with torch's DEFAULT
        # eps — unlike the 1e-12 BERT norms everywhere else (HF GIT's
        # GitProjection agrees: eps = vision_config.layer_norm_eps)
        self.visual_ln = FusedLayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                                        name="visual_ln")
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=cfg.dtype,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(cfg.max_caption_length,
                                            cfg.hidden_size, dtype=cfg.dtype,
                                            name="position_embeddings")
        self.emb_norm = FusedLayerNorm(epsilon=1e-12, dtype=cfg.dtype,
                                       name="emb_norm")
        self.emb_drop = nn.Dropout(cfg.dropout)
        self.layers = [
            BertLayer(cfg.hidden_size, cfg.attention_heads,
                      cfg.feedforward_size, cfg.dropout, cfg.dtype,
                      cfg.quantized, name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]
        self.output = dense(cfg.vocab_size, dtype=cfg.dtype, name="output")

    def project_visual(self, visual: jnp.ndarray) -> jnp.ndarray:
        return self.visual_ln(self.visual_projection(visual))

    def embed_text(self, tokens: jnp.ndarray,
                   offset: int | jnp.ndarray = 0,
                   deterministic: bool = True) -> jnp.ndarray:
        l = tokens.shape[1]
        positions = jnp.arange(l) + offset
        emb = self.word_embeddings(tokens) + self.position_embeddings(positions)
        emb = self.emb_norm(emb)
        return self.emb_drop(emb, deterministic=deterministic)

    def __call__(self, visual: jnp.ndarray, caption_tokens: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Teacher-forced forward.

        visual: [B, P, visual_feature_size]; caption_tokens: [B, T].
        Returns (logits [B, T, vocab], hidden states per layer [B, P+T, H]).
        """
        vis = self.project_visual(visual)
        txt = self.embed_text(caption_tokens, deterministic=deterministic)
        x = jnp.concatenate([vis, txt], axis=1)
        p = vis.shape[1]
        hidden: List[jnp.ndarray] = []
        for layer in self.layers:
            x = layer(x, prefix_len=p, deterministic=deterministic)
            hidden.append(x)
        logits = self.output(x[:, p:])
        return logits, hidden

    # ---- incremental decoding --------------------------------------------
    def init_cache(self, visual: jnp.ndarray, max_text: int) -> List[Cache]:
        """Prefill per-layer visual K/V by running the visual prefix through
        the stack ONCE (GIT's ``prev_encoded_layers`` history, reference
        model.py:439-445): layer i's cached keys/values come from layer
        i-1's hidden states over the visual tokens, not the layer-0 input."""
        x = self.project_visual(visual)
        caches: List[Cache] = []
        for layer in self.layers:
            caches.append(layer.init_cache(x, max_text))
            # visual-only self-attention (full bidirectional within prefix)
            x = layer(x, prefix_len=x.shape[1])
        return caches

    def decode_step(self, token: jnp.ndarray, text_index: jnp.ndarray,
                    caches: List[Cache], prefix_len: int
                    ) -> Tuple[jnp.ndarray, List[Cache]]:
        x = self.embed_text(token[:, None], offset=text_index)
        new: List[Cache] = []
        for layer, cache in zip(self.layers, caches):
            x, c = layer.decode_step(x, cache, text_index, prefix_len)
            new.append(c)
        return self.output(x)[:, 0], new


class GITTeacher(nn.Module):
    """Full GIT teacher (CLIP image tower + temporal embeds + textual head).

    Mirrors ``GenerativeImageTextModel`` + ``GenerativeImageTextTeacher``
    (reference model.py:343-462, 721-793) as one frozen flax module with
    explicit intermediate outputs.
    """

    config: GITConfig = GITConfig()

    def setup(self):
        cfg = self.config
        self.image_encoder = CLIPViT(cfg.clip, name="image_encoder")
        self.img_temporal_embedding = [
            self.param(f"img_temporal_embedding_{i}", nn.initializers.zeros,
                       (1, 1, cfg.visual_feature_size))
            for i in range(cfg.num_image_with_embedding)
        ]
        self.textual = TextualHead(cfg, name="textual")

    def encode_frames(self, frames: jnp.ndarray,
                      block_indices: Optional[Tuple[int, ...]] = None
                      ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """frames: [B, F, H, W, 3] → visual features [B, F*257, 1024] plus
        per-tap CLS tokens [B, F, 1024] at the requested encoder blocks
        (reference hooks at resblocks arange(0,23,6), model.py:844-847)."""
        cfg = self.config
        if frames.shape[2] == 3 and frames.shape[-1] != 3:
            frames = jnp.transpose(frames, (0, 1, 3, 4, 2))
        b, f = frames.shape[:2]
        flat = frames.reshape((b * f,) + frames.shape[2:])
        tokens, taps = self.image_encoder(flat, block_indices)
        tokens = tokens.reshape(b, f, tokens.shape[1], cfg.visual_feature_size)
        per_frame = [tokens[:, i] + self.img_temporal_embedding[i]
                     for i in range(f)]
        visual = jnp.concatenate(per_frame, axis=1)  # [B, F*257, 1024]
        cls_taps = [t.reshape(b, f, -1, cfg.visual_feature_size)[:, :, 0]
                    for t in taps]
        return visual, cls_taps

    def forward_output_logits(self, frames: jnp.ndarray, captions: jnp.ndarray,
                              block_indices: Optional[Tuple[int, ...]] = None):
        """Batched teacher-forced pass (reference forward_output_logits,
        model.py:747-760, minus the per-sample Python loop).

        Returns (logits [B, T, V], visual [B, 1542, 1024],
                 decoder hidden states list, encoder CLS taps list)."""
        visual, cls_taps = self.encode_frames(frames, block_indices)
        logits, hidden = self.textual(visual, captions)
        return logits, visual, hidden, cls_taps

    def __call__(self, frames: jnp.ndarray, captions: jnp.ndarray):
        logits, visual, hidden, _ = self.forward_output_logits(frames, captions)
        return logits

    # ---- pieces used by the beam-search driver (decode.py) ----------------
    def encode_only(self, frames: jnp.ndarray) -> jnp.ndarray:
        visual, _ = self.encode_frames(frames)
        return visual

    def init_cache(self, visual: jnp.ndarray, max_text: int) -> List[Cache]:
        return self.textual.init_cache(visual, max_text)

    def decode_step(self, token: jnp.ndarray, text_index: jnp.ndarray,
                    caches: List[Cache], prefix_len: int):
        return self.textual.decode_step(token, text_index, caches, prefix_len)


# Reference-compatible alias (reference class name, model.py:721).
GenerativeImageTextTeacher = GITTeacher


def get_git_model(param: Dict[str, Any], dtype: jnp.dtype = jnp.float32,
                  quantized: bool = False) -> "GITTeacher":
    """Factory mirroring the reference's ``get_git_model``
    (model.py:681-718): builds the image encoder from
    ``param['image_encoder_type']`` (default CLIPViT_B_16 like the
    reference) and the 768-d, 6-layer, 12-head textual head with
    ``visual_feature_size`` from the param dict. ``param`` is the teacher's
    parameter.yaml content (e.g. GIT_LARGE_MSRVTT: num_image_with_embedding
    6, visual_feature_size 1024, image_encoder_type CLIPViT_L_14)."""
    from .clip_vit import IMAGE_ENCODERS

    encoder_type = param.get("image_encoder_type", "CLIPViT_B_16")
    resolution = param.get("test_crop_size", 224)
    clip = IMAGE_ENCODERS[encoder_type](image_size=resolution, dtype=dtype,
                                        quantized=quantized)
    git = GITConfig(
        visual_feature_size=param.get("visual_feature_size", 768),
        vocab_size=30522,
        hidden_size=768,
        num_layers=6,
        attention_heads=12,
        feedforward_size=768 * 4,
        max_caption_length=1024,
        num_image_with_embedding=param.get("num_image_with_embedding", 6),
        clip=clip,
        dtype=dtype,
        quantized=quantized,
    )
    return GITTeacher(git)


def load_teacher_param_yaml(path: str) -> Dict[str, Any]:
    """YAML loader for teacher parameter files (reference
    ``load_from_yaml_file``, model.py:734)."""
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)


def quantize_teacher_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Float teacher variables → W8A8 variables (for GITConfig.quantized)."""
    from ..ops.quantization import quantize_teacher_params
    out = dict(variables)
    out["params"] = quantize_teacher_params(variables["params"])
    return out


def teacher_from_config(cfg) -> GITTeacher:
    dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32
    git = GITConfig(
        vocab_size=cfg.teacher.vocab_size,
        hidden_size=cfg.teacher.hidden_size,
        num_layers=cfg.teacher.num_layers,
        attention_heads=cfg.teacher.attention_heads,
        feedforward_size=cfg.teacher.feedforward_size,
        visual_feature_size=cfg.teacher.visual_feature_size,
        max_caption_length=cfg.teacher.max_caption_length,
        num_image_with_embedding=cfg.teacher.num_image_with_embedding,
        clip=clip_vit_l14_config(dtype=dtype,
                                 quantized=cfg.tpu.quantize_teacher),
        dtype=dtype,
        quantized=cfg.tpu.quantize_teacher,
    )
    return GITTeacher(git)
