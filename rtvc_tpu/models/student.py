"""StudentCandidateV1: TinyViT frame encoder + Transformer caption decoder.

Rebuild of the reference student (reference src/models/model.py:50-317):

- ``forward_image_enc`` (model.py:114-133): frames [B, F, 224, 224, 3] are
  folded into the batch, run through TinyViT, and the last stage's spatial
  mean becomes the 6-token, 576-d decoder memory;
- ``forward_decoder`` (model.py:135-154): token embedding + sinusoidal
  positional encoding, then — preserving the reference's quirk — the embedded
  sequence is DIVIDED by sqrt(d_model) *after* the positional encoding is
  added (model.py:146-150), then a 2-layer post-norm Transformer decoder
  (torch ``nn.TransformerDecoderLayer`` semantics: self-attn → add+LN →
  cross-attn → add+LN → ReLU-MLP → add+LN, batch-first) and a vocab
  projection;
- distillation projectors (model.py:87-94): four Dense(1024) stage-mean
  projectors, Dense(1542) upsample, Dense(1024) project, Dense(768)
  decoder projector — all with known input dims (torch used LazyLinear);
- returns per-layer decoder hidden states explicitly (the reference captured
  them with forward hooks, model.py:850-852 — JAX has no hooks, so
  intermediates are first-class outputs).

TPU-native decode support (no reference equivalent — the reference re-ran
the full decoder per generated token, model.py:156-187): each decoder layer
can run in single-step mode against a preallocated KV cache, so greedy/beam
decoding is a fixed-shape ``lax`` loop over one-token decoder invocations.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.layernorm import FusedLayerNorm
from .layers import PositionalEncoding
from .tinyvit import TinyViT, TinyViTConfig, stage_means, tiny_vit_21m_config

Cache = Dict[str, jnp.ndarray]


class MHAProjections(nn.Module):
    """Fused in-projection + out-projection around ops.multi_head_attention
    (mirrors torch nn.MultiheadAttention's packed in_proj layout so converted
    checkpoints map 1:1)."""

    d_model: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # packed qkv in-projection, torch nn.MultiheadAttention layout
        # (in_proj_weight [3D, D] stored transposed here as [D, 3D])
        self.in_proj_kernel = self.param(
            "in_proj_kernel",
            nn.initializers.xavier_uniform(),
            (self.d_model, 3 * self.d_model))
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * self.d_model,))
        self.out_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                 name="out_proj")

    def _split_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        return x.reshape(b, l, self.n_head, -1).transpose(0, 2, 1, 3)

    def _merge_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def project_qkv(self, q_in: jnp.ndarray, kv_in: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        w = jnp.asarray(self.in_proj_kernel, self.dtype)
        b = jnp.asarray(self.in_proj_bias, self.dtype)
        d = self.d_model
        q = q_in @ w[:, :d] + b[:d]
        k = kv_in @ w[:, d:2 * d] + b[d:2 * d]
        v = kv_in @ w[:, 2 * d:] + b[2 * d:]
        return (self._split_heads(q), self._split_heads(k),
                self._split_heads(v))

    def __call__(self, q_in: jnp.ndarray, kv_in: jnp.ndarray, *,
                 causal: bool = False, kv_mask: Optional[jnp.ndarray] = None,
                 dropout_rate: float = 0.0,
                 dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        q, k, v = self.project_qkv(q_in, kv_in)
        out = multi_head_attention(q, k, v, causal=causal, kv_mask=kv_mask,
                                   dropout_rate=dropout_rate,
                                   dropout_rng=dropout_rng)
        return self.out_proj(self._merge_heads(out))

    def attend_with_cache(self, q_in: jnp.ndarray, k: jnp.ndarray,
                          v: jnp.ndarray,
                          kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Single-step attention: q_in [B, 1, D]; k/v already projected+split."""
        w = jnp.asarray(self.in_proj_kernel, self.dtype)
        b = jnp.asarray(self.in_proj_bias, self.dtype)
        d = self.d_model
        q = self._split_heads(q_in @ w[:, :d] + b[:d])
        out = multi_head_attention(q, k, v, kv_mask=kv_mask, use_pallas=False)
        return self.out_proj(self._merge_heads(out))

    def project_kv(self, kv_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = jnp.asarray(self.in_proj_kernel, self.dtype)
        b = jnp.asarray(self.in_proj_bias, self.dtype)
        d = self.d_model
        k = kv_in @ w[:, d:2 * d] + b[d:2 * d]
        v = kv_in @ w[:, 2 * d:] + b[2 * d:]
        return self._split_heads(k), self._split_heads(v)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer with torch ``nn.TransformerDecoderLayer``
    semantics (reference model.py:75-78: d_model 576, 8 heads, ffn 1024,
    dropout 0.3, ReLU, batch_first, norm-last)."""

    d_model: int
    n_head: int
    d_ffn: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MHAProjections(self.d_model, self.n_head, self.dtype)
        self.cross_attn = MHAProjections(self.d_model, self.n_head, self.dtype)
        self.linear1 = nn.Dense(self.d_ffn, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.norm1 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        h = nn.relu(self.linear1(x))
        h = self.drop(h, deterministic=deterministic)
        h = self.linear2(h)
        return h

    def __call__(self, x: jnp.ndarray, memory: jnp.ndarray, *,
                 tgt_kv_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        det = deterministic
        rng = None if det else self.make_rng("dropout")
        sa = self.self_attn(x, x, causal=True, kv_mask=tgt_kv_mask,
                            dropout_rate=0.0 if det else self.dropout,
                            dropout_rng=rng)
        x = self.norm1(x + self.drop(sa, deterministic=det))
        rng = None if det else self.make_rng("dropout")
        ca = self.cross_attn(x, memory,
                             dropout_rate=0.0 if det else self.dropout,
                             dropout_rng=rng)
        x = self.norm2(x + self.drop(ca, deterministic=det))
        x = self.norm3(x + self.drop(self._ffn(x, det), deterministic=det))
        return x

    # ---- incremental decoding -------------------------------------------
    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> Cache:
        head_dim = self.d_model // self.n_head
        mem_k, mem_v = self.cross_attn.project_kv(memory)
        zeros = jnp.zeros((batch, self.n_head, max_len, head_dim), self.dtype)
        return {"k": zeros, "v": jnp.zeros_like(zeros),
                "mem_k": mem_k, "mem_v": mem_v}

    def decode_step(self, x: jnp.ndarray, cache: Cache, index: jnp.ndarray,
                    kv_mask: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, Cache]:
        """x: [B, 1, D]; index: scalar position of this token.

        ``kv_mask`` [B, max_len] marks valid cache slots. The caller passes
        (pos <= index) & (token != 0) so generation matches the reference's
        full-recompute behavior, where forward_decoder masks keys at padded
        (id 0) positions (reference model.py:143-153) even mid-generation.
        """
        q, k_new, v_new = self.self_attn.project_qkv(x, x)
        k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k_new, index, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v_new, index, axis=2)
        max_len = k.shape[2]
        if kv_mask is None:
            kv_mask = (jnp.arange(max_len) <= index)[None, :]
        sa_out = multi_head_attention(q, k, v, kv_mask=kv_mask, use_pallas=False)
        sa = self.self_attn.out_proj(self.self_attn._merge_heads(sa_out))
        x = self.norm1(x + sa)
        ca = self.cross_attn.attend_with_cache(x, cache["mem_k"], cache["mem_v"])
        x = self.norm2(x + ca)
        x = self.norm3(x + self._ffn(x, True))
        return x, {"k": k, "v": v, "mem_k": cache["mem_k"],
                   "mem_v": cache["mem_v"]}


class StudentCandidateV1(nn.Module):
    """TinyViT-21M frame encoder + N-layer caption decoder (reference
    model.py:50-154), with explicit intermediates and KV-cache decoding."""

    d_model: int = 576
    n_head: int = 8
    d_ffn: int = 1024
    dropout: float = 0.3
    num_decoder_layers: int = 2
    vocab_size: int = 30522
    cls_token_id: int = 101
    sep_token_id: int = 102
    max_pos_len: int = 500
    encoder_config: TinyViTConfig = tiny_vit_21m_config()
    teacher_visual_dim: int = 1024
    teacher_num_tokens: int = 1542
    teacher_hidden: int = 768
    dtype: jnp.dtype = jnp.float32
    remat_encoder: bool = False  # rematerialize TinyViT activations in bwd

    def setup(self):
        # static_argnums indexes __call__ args INCLUDING self: train is 2
        # (train must also be passed positionally at the call site)
        enc_cls = (nn.remat(TinyViT, static_argnums=(2,))
                   if self.remat_encoder else TinyViT)
        self.image_encoder = enc_cls(self.encoder_config, name="image_encoder")
        self.layers = [
            TransformerDecoderLayer(self.d_model, self.n_head, self.d_ffn,
                                    self.dropout, self.dtype,
                                    name=f"decoder_layer_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                              name="embed")
        self.vocab_proj = nn.Dense(self.vocab_size, dtype=self.dtype,
                                   name="linear")
        self.pos_enc = PositionalEncoding(self.d_model, self.max_pos_len,
                                          name="pos_enc")
        # Distillation projectors (reference model.py:87-94, LazyLinear then)
        self.projectors = [
            nn.Dense(self.teacher_visual_dim, dtype=self.dtype,
                     name=f"projector_{i}")
            for i in range(4)
        ]
        self.upsample = nn.Dense(self.teacher_num_tokens, dtype=self.dtype,
                                 name="upsample")
        self.project = nn.Dense(self.teacher_visual_dim, dtype=self.dtype,
                                name="project")
        self.project_decoder = nn.Dense(self.teacher_hidden, dtype=self.dtype,
                                        name="project_decoder")

    # ---- encoder ----------------------------------------------------------
    def forward_image_enc(self, x: jnp.ndarray, train: bool = False
                          ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """x: [B, F, H, W, 3] (NHWC) or [B, F, 3, H, W] (reference NCHW)."""
        if x.shape[2] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 1, 3, 4, 2))
        b, f = x.shape[:2]
        flat = x.reshape((b * f,) + x.shape[2:])
        fmaps = self.image_encoder(flat, train)  # positional: remat static arg
        memory = stage_means(fmaps[-1:])[0].reshape(b, f, -1)
        return fmaps, memory

    # ---- decoder ----------------------------------------------------------
    def _embed_tokens(self, y: jnp.ndarray, offset: int | jnp.ndarray = 0
                      ) -> jnp.ndarray:
        emb = self.embed(y)
        emb = self.pos_enc(emb, offset=offset)
        # reference quirk (model.py:146-150): division AFTER pos-enc add
        return emb / jnp.sqrt(jnp.asarray(self.d_model, emb.dtype))

    def forward_decoder(self, y: jnp.ndarray, memory: jnp.ndarray,
                        train: bool = False, return_hidden: bool = False):
        """Teacher-forced full-sequence decode → logits [B, L, V]."""
        tgt_valid = y != 0  # key-padding mask (reference model.py:143)
        x = self._embed_tokens(y)
        hidden: List[jnp.ndarray] = []
        for layer in self.layers:
            x = layer(x, memory, tgt_kv_mask=tgt_valid,
                      deterministic=not train)
            hidden.append(x)
        logits = self.vocab_proj(x)
        if return_hidden:
            return logits, hidden
        return logits

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, train: bool = False):
        """Full forward (reference model.py:106-112): fmaps + logits."""
        fmaps, memory = self.forward_image_enc(x, train=train)
        out = self.forward_decoder(y, memory, train=train)
        return fmaps + [out]

    def distill_forward(self, x: jnp.ndarray, y: jnp.ndarray,
                        train: bool = True, need_fmap: bool = False,
                        need_visual: bool = False,
                        need_decoder: bool = False) -> Dict[str, Any]:
        """Training-step forward returning exactly the intermediates the
        configured distillation losses need (replaces the reference's hook
        harvesting, model.py:844-857). Flags are static so XLA never
        computes unused heads."""
        fmaps, memory = self.forward_image_enc(x, train=train)
        logits, hidden = self.forward_decoder(y, memory, train=train,
                                              return_hidden=True)
        out: Dict[str, Any] = {"logits": logits, "memory": memory}
        if need_fmap:
            out["proj_means"] = self.project_stage_means(fmaps)
        if need_visual:
            up = self.upsample(jnp.swapaxes(memory, 1, 2))
            out["student_visual"] = self.project(jnp.swapaxes(up, 1, 2))
        if need_decoder:
            out["hidden_proj"] = [self.project_decoder(h) for h in hidden]
        return out

    def full_init(self, x: jnp.ndarray, y: jnp.ndarray):
        """Initialization-only forward touching EVERY parameterized head
        (flax creates params lazily on first call; the distillation
        projectors are not on the ``__call__`` path). Use
        ``model.init(rng, x, y, method=StudentCandidateV1.full_init)``."""
        fmaps, memory = self.forward_image_enc(x)
        logits, hidden = self.forward_decoder(y, memory, return_hidden=True)
        proj = self.project_stage_means(fmaps)
        dec = self.project_decoder(hidden[-1])
        # loss-4 path (dead in the reference, model.py:937-944): expand the
        # F-token memory to teacher token count, then to teacher width
        up = self.upsample(jnp.swapaxes(memory, 1, 2))      # [B, D, 1542]
        vis = self.project(jnp.swapaxes(up, 1, 2))          # [B, 1542, 1024]
        return logits, proj, dec, vis

    # ---- distillation heads ------------------------------------------------
    def project_stage_means(self, fmaps: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """Project the 4 stage means to teacher width (model.py:908-917)."""
        means = stage_means(fmaps)
        return [proj(m) for proj, m in zip(self.projectors, means)]

    def project_decoder_hidden(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.project_decoder(hidden)

    # ---- incremental decode -------------------------------------------------
    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray
                   ) -> List[Cache]:
        return [layer.init_cache(batch, max_len, memory)
                for layer in self.layers]

    def decode_step(self, token: jnp.ndarray, index: jnp.ndarray,
                    caches: List[Cache],
                    kv_mask: Optional[jnp.ndarray] = None,
                    vocab_w8: Optional[Dict[str, jnp.ndarray]] = None
                    ) -> Tuple[jnp.ndarray, List[Cache]]:
        """token: [B] ids at position ``index`` → logits [B, V], new caches.

        ``vocab_w8`` (optional, from ``quantization.quantize_vocab_head``):
        run the vocab projection through the weight-only int8 Pallas GEMV
        (ops/int8_gemm.w8_matmul) instead of the bf16 Dense. Opt-in
        serving knob; logits shift by ~bf16-rounding scale, and at THIS
        model's shapes it measured a wash in the composed step (the
        w8_matmul docstring records the verdict).
        """
        x = self._embed_tokens(token[:, None], offset=index)
        new_caches: List[Cache] = []
        for layer, cache in zip(self.layers, caches):
            x, c = layer.decode_step(x, cache, index, kv_mask=kv_mask)
            new_caches.append(c)
        if vocab_w8 is not None:
            from ..ops.int8_gemm import w8_dense
            logits = w8_dense(x[:, 0], vocab_w8["wq"], vocab_w8["sw"],
                              bias=vocab_w8["bias"], out_dtype=self.dtype)
            return logits[:, :self.vocab_size], new_caches
        return self.vocab_proj(x)[:, 0], new_caches


def student_matching_checkpoint(cfg, ckpt_path: str) -> StudentCandidateV1:
    """``student_from_config``, but the activation variant RECORDED at save
    time (the checkpoint's sidecar meta, data/io.py) overrides the config:
    weights trained with exact-erf GELU must not be silently run under the
    tanh training default (≈1.5e-2 rel activation shift, docs/PERF.md §1b).
    Checkpoints without a sidecar behave as before (config wins)."""
    import dataclasses

    from ..data.io import checkpoint_meta

    g = checkpoint_meta(ckpt_path).get("gelu_approximate")
    if g is not None and bool(g) != cfg.student.gelu_approximate:
        cfg = dataclasses.replace(cfg, student=dataclasses.replace(
            cfg.student, gelu_approximate=bool(g)))
    return student_from_config(cfg)


def student_from_config(cfg) -> StudentCandidateV1:
    """Build the student from a ``Config`` (rtvc_tpu.config.Config)."""
    enc = tiny_vit_21m_config(
        dtype=jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32,
        gelu_approximate=cfg.student.gelu_approximate)
    return StudentCandidateV1(
        d_model=cfg.student.d_model,
        n_head=cfg.student.n_head,
        d_ffn=cfg.student.d_ffn,
        dropout=cfg.student.dropout,
        num_decoder_layers=cfg.student.num_decoder_layers,
        vocab_size=cfg.student.vocab_size,
        cls_token_id=cfg.student.cls_token_id,
        sep_token_id=cfg.student.sep_token_id,
        max_pos_len=cfg.student.max_pos_len,
        encoder_config=enc,
        teacher_visual_dim=cfg.teacher.visual_feature_size,
        teacher_num_tokens=cfg.teacher.num_image_with_embedding * 257,
        teacher_hidden=cfg.teacher.hidden_size,
        dtype=enc.dtype,
        remat_encoder=cfg.tpu.remat_encoder,
    )
