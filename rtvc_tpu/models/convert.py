"""PyTorch checkpoint → JAX pytree converters.

The three external weight sources the reference consumed (SURVEY.md §5):

1. timm ``tiny_vit_21m_224`` (student encoder, reference model.py:38)
   → :func:`tinyvit_params_from_torch`
2. GIT-Large ``model.pt`` (teacher, reference model.py:736-738)
   → :func:`git_teacher_params_from_torch`
3. the reference's own Lightning distillation checkpoints
   (``student.``-prefixed state dict, reference inference.py:36-38)
   → :func:`student_params_from_torch`

Conventions:
- torch Linear weight [out, in] → flax Dense kernel [in, out] (transpose);
- torch Conv2d weight [O, I/g, kh, kw] → flax NHWC kernel [kh, kw, I/g, O];
- torch (Layer|Batch)Norm weight/bias → flax scale/bias; BatchNorm
  running_mean/var land in the ``batch_stats`` collection;
- torch MultiheadAttention packed ``in_proj_weight`` [3D, D] →
  ``in_proj_kernel`` [D, 3D] (transpose keeps the q|k|v column order).

Converters are *reporting*: they return (params[, batch_stats]) plus the
lists of source keys they could not place and target leaves they could not
fill, so a naming drift against a real checkpoint fails loudly in tests
instead of silently producing garbage. Name maps follow the published
module layouts (timm tiny_vit.py, OpenAI CLIP, GIT's TransformerDecoder
TextualHead); exact-key verification against real checkpoints is a
round-2+ task (no weights are downloadable in this sandbox).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Any]


def _t(x) -> Array:
    """torch tensor → numpy (no torch import needed if already numpy)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: StateDict, prefix: str, used: set) -> Dict[str, Array]:
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    used.add(prefix + ".weight")
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
        used.add(prefix + ".bias")
    return out


def _packed_qkv(sd: StateDict, prefixes: Tuple[str, str, str],
                used: set) -> Dict[str, Array]:
    """Pack three torch Linears (query, key, value) into one fused-QKV
    Dense: kernels concat along the output axis in q|k|v column order
    (matches ``BertLayer.qkv``; see git_teacher.py)."""
    parts = [_linear(sd, p, used) for p in prefixes]
    out = {"kernel": np.concatenate([p["kernel"] for p in parts], axis=1)}
    if all("bias" in p for p in parts):
        out["bias"] = np.concatenate([p["bias"] for p in parts])
    return out


def _norm(sd: StateDict, prefix: str, used: set) -> Dict[str, Array]:
    used.update({prefix + ".weight", prefix + ".bias"})
    return {"scale": _t(sd[prefix + ".weight"]),
            "bias": _t(sd[prefix + ".bias"])}


def _conv(sd: StateDict, prefix: str, used: set) -> Dict[str, Array]:
    used.add(prefix + ".weight")
    w = _t(sd[prefix + ".weight"])  # [O, I/g, kh, kw]
    return {"kernel": w.transpose(2, 3, 1, 0)}


def _convbn(sd: StateDict, prefix: str, used: set
            ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """timm ConvNorm unit: ``<prefix>.conv`` + ``<prefix>.bn``."""
    params = {"conv": _conv(sd, prefix + ".conv", used),
              "bn": _norm(sd, prefix + ".bn", used)}
    used.update({prefix + ".bn.running_mean", prefix + ".bn.running_var"})
    stats = {"bn": {"mean": _t(sd[prefix + ".bn.running_mean"]),
                    "var": _t(sd[prefix + ".bn.running_var"])}}
    return params, stats


# ---------------------------------------------------------------------------
# TinyViT (timm tiny_vit_21m_224 state dict)
# ---------------------------------------------------------------------------

def tinyvit_params_from_torch(sd: StateDict, depths=(2, 2, 6, 2)
                              ) -> Tuple[Dict, Dict, List[str]]:
    """Returns (params, batch_stats, unused_source_keys)."""
    used: set = set()
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for i, name in ((1, "conv1"), (2, "conv2")):
        p, s = _convbn(sd, f"patch_embed.{name}", used)
        params.setdefault("patch_embed", {})[name] = p
        stats.setdefault("patch_embed", {})[name] = s

    # stage 0: MBConv blocks
    for d in range(depths[0]):
        blk_p, blk_s = {}, {}
        for conv in ("conv1", "conv2", "conv3"):
            p, s = _convbn(sd, f"stages.0.blocks.{d}.{conv}", used)
            blk_p[conv] = p
            blk_s[conv] = s
        params[f"stage0_block{d}"] = blk_p
        stats[f"stage0_block{d}"] = blk_s

    # stages 1-3: downsample + attention blocks
    for s_idx in range(1, 4):
        ds_p, ds_s = {}, {}
        for conv in ("conv1", "conv2", "conv3"):
            p, s = _convbn(sd, f"stages.{s_idx}.downsample.{conv}", used)
            ds_p[conv] = p
            ds_s[conv] = s
        params[f"stage{s_idx}_downsample"] = ds_p
        stats[f"stage{s_idx}_downsample"] = ds_s

        for d in range(depths[s_idx]):
            base = f"stages.{s_idx}.blocks.{d}"
            attn = {
                "norm": _norm(sd, f"{base}.attn.norm", used),
                "qkv": _linear(sd, f"{base}.attn.qkv", used),
                "proj": _linear(sd, f"{base}.attn.proj", used),
                "attention_biases": _t(sd[f"{base}.attn.attention_biases"]),
            }
            used.add(f"{base}.attn.attention_biases")
            lc_p, lc_s = _convbn(sd, f"{base}.local_conv", used)
            mlp = {
                "norm": _norm(sd, f"{base}.mlp.norm", used),
                "fc1": _linear(sd, f"{base}.mlp.fc1", used),
                "fc2": _linear(sd, f"{base}.mlp.fc2", used),
            }
            params[f"stage{s_idx}_block{d}"] = {
                "attn": attn, "local_conv": lc_p, "mlp": mlp}
            stats[f"stage{s_idx}_block{d}"] = {"local_conv": lc_s}

    unused = [k for k in sd
              if k not in used and not k.endswith("attention_bias_idxs")
              and not k.endswith("num_batches_tracked")
              and not k.startswith(("head", "norm_head"))]
    return params, stats, unused


# ---------------------------------------------------------------------------
# CLIP ViT (GIT's image_encoder.* keys)
# ---------------------------------------------------------------------------

def clip_params_from_torch(sd: StateDict, prefix: str = "",
                           layers: int = 24) -> Tuple[Dict, List[str]]:
    used: set = set()
    p = prefix
    params: Dict[str, Any] = {
        "conv1": _conv(sd, p + "conv1", used),
        "class_embedding": _t(sd[p + "class_embedding"]),
        "positional_embedding": _t(sd[p + "positional_embedding"]),
        "ln_pre": _norm(sd, p + "ln_pre", used),
        "ln_post": _norm(sd, p + "ln_post", used),
    }
    used.update({p + "class_embedding", p + "positional_embedding"})
    for i in range(layers):
        base = f"{p}transformer.resblocks.{i}"
        used.update({f"{base}.attn.in_proj_weight",
                     f"{base}.attn.in_proj_bias"})
        params[f"resblock_{i}"] = {
            "ln_1": _norm(sd, f"{base}.ln_1", used),
            "ln_2": _norm(sd, f"{base}.ln_2", used),
            "attn": {
                "qkv": {"kernel": _t(sd[f"{base}.attn.in_proj_weight"]).T,
                        "bias": _t(sd[f"{base}.attn.in_proj_bias"])},
                "out_proj": _linear(sd, f"{base}.attn.out_proj", used),
            },
            "mlp_fc": _linear(sd, f"{base}.mlp.c_fc", used),
            "mlp_proj": _linear(sd, f"{base}.mlp.c_proj", used),
        }
    unused = [k for k in sd if k.startswith(p) and k not in used
              and ".proj" != k[len(p):]]
    return params, unused


# ---------------------------------------------------------------------------
# GIT teacher (model.pt['model'])
# ---------------------------------------------------------------------------

def git_teacher_params_from_torch(sd: StateDict, num_layers: int = 6,
                                  clip_layers: int = 24,
                                  num_frames: int = 6
                                  ) -> Tuple[Dict, List[str]]:
    """Full teacher: CLIP tower + temporal embeddings + textual head."""
    used: set = set()
    clip, clip_unused = clip_params_from_torch(
        sd, prefix="image_encoder.", layers=clip_layers)
    params: Dict[str, Any] = {"image_encoder": clip}

    for i in range(num_frames):
        key = f"img_temperal_embedding.{i}"  # GIT's spelling
        params[f"img_temporal_embedding_{i}"] = _t(sd[key]).reshape(1, 1, -1)
        used.add(key)

    tx: Dict[str, Any] = {
        "visual_projection": _linear(sd, "textual.visual_projection.0", used),
        "visual_ln": _norm(sd, "textual.visual_projection.1", used),
        "word_embeddings": {
            "embedding": _t(sd["textual.embedding.words.weight"])},
        "position_embeddings": {
            "embedding": _t(sd["textual.embedding.positions.weight"])},
        "emb_norm": _norm(sd, "textual.embedding.layer_norm", used),
        "output": _linear(sd, "textual.output", used),
    }
    used.update({"textual.embedding.words.weight",
                 "textual.embedding.positions.weight"})
    for i in range(num_layers):
        base = f"textual.transformer.encoder.layer.{i}"
        tx[f"layer_{i}"] = {
            "qkv": _packed_qkv(sd, (f"{base}.attention.self.query",
                                    f"{base}.attention.self.key",
                                    f"{base}.attention.self.value"), used),
            "attn_out": _linear(sd, f"{base}.attention.output.dense", used),
            "attn_norm": _norm(sd, f"{base}.attention.output.LayerNorm", used),
            "inter": _linear(sd, f"{base}.intermediate.dense", used),
            "out": _linear(sd, f"{base}.output.dense", used),
            "out_norm": _norm(sd, f"{base}.output.LayerNorm", used),
        }
    params["textual"] = tx
    unused = clip_unused + [
        k for k in sd
        if not k.startswith("image_encoder.") and k not in used]
    return params, unused


# ---------------------------------------------------------------------------
# Student (the reference's own Lightning checkpoint)
# ---------------------------------------------------------------------------

def mha_params_from_torch(sd: StateDict, prefix: str,
                          used: set) -> Dict[str, Any]:
    """torch nn.MultiheadAttention → MHAProjections params."""
    used.update({f"{prefix}.in_proj_weight", f"{prefix}.in_proj_bias"})
    return {
        "in_proj_kernel": _t(sd[f"{prefix}.in_proj_weight"]).T,
        "in_proj_bias": _t(sd[f"{prefix}.in_proj_bias"]),
        "out_proj": _linear(sd, f"{prefix}.out_proj", used),
    }


def decoder_layer_params_from_torch(sd: StateDict, base: str,
                                    used: set) -> Dict[str, Any]:
    """torch nn.TransformerDecoderLayer → our TransformerDecoderLayer params
    (self_attn / multihead_attn / linear1 / linear2 / norm1-3)."""
    return {
        "self_attn": mha_params_from_torch(sd, f"{base}.self_attn", used),
        "cross_attn": mha_params_from_torch(sd, f"{base}.multihead_attn", used),
        "linear1": _linear(sd, f"{base}.linear1", used),
        "linear2": _linear(sd, f"{base}.linear2", used),
        "norm1": _norm(sd, f"{base}.norm1", used),
        "norm2": _norm(sd, f"{base}.norm2", used),
        "norm3": _norm(sd, f"{base}.norm3", used),
    }


def student_params_from_torch(sd: StateDict, num_decoder_layers: int = 2,
                              encoder_depths=(2, 2, 6, 2)
                              ) -> Tuple[Dict, Dict, List[str]]:
    """Reference StudentCandidateV1 state dict → our param/batch_stats trees.

    Accepts full Lightning DistillationTrainer checkpoints: like the
    reference (io.py:20-23), only ``student.``-prefixed keys are kept (the
    checkpoint also contains the frozen ``teacher.*`` weights) and the
    prefix is stripped.
    """
    if any(k.startswith("student.") for k in sd):
        sd = {k[len("student."):]: v for k, v in sd.items()
              if k.startswith("student.")}
    used: set = set()

    enc_sd = {k[len("image_encoder.model."):]: v for k, v in sd.items()
              if k.startswith("image_encoder.model.")}
    enc_params, enc_stats, enc_unused = tinyvit_params_from_torch(
        enc_sd, depths=encoder_depths)

    params: Dict[str, Any] = {"image_encoder": enc_params}
    stats: Dict[str, Any] = {"image_encoder": enc_stats}

    for i in range(num_decoder_layers):
        params[f"decoder_layer_{i}"] = decoder_layer_params_from_torch(
            sd, f"decoder.layers.{i}", used)

    params["embed"] = {"embedding": _t(sd["embed.weight"])}
    used.add("embed.weight")
    params["linear"] = _linear(sd, "linear", used)

    # distillation heads (LazyLinear in the reference — may be absent if the
    # checkpoint was saved post-strip, reference io.py:27-34)
    for i in range(4):
        if f"projectors.{i}.weight" in sd:
            params[f"projector_{i}"] = _linear(sd, f"projectors.{i}", used)
    for src, dst in (("upsample", "upsample"), ("project", "project"),
                     ("project_decoder", "project_decoder")):
        if f"{src}.weight" in sd:
            params[dst] = _linear(sd, src, used)

    unused = [f"image_encoder.model.{k}" for k in enc_unused] + [
        k for k in sd
        if not k.startswith("image_encoder.model.") and k not in used
        and not k.startswith(("pos_enc.", "decoder.norm"))]
    return params, stats, unused


# ---------------------------------------------------------------------------
# HuggingFace GIT (transformers GitForCausalLM state dict)
# ---------------------------------------------------------------------------
#
# The reference's teacher weights (GIT_LARGE_MSRVTT model.pt, reference
# README "Installing the GIT model weights") were also converted by the
# transformers project into `microsoft/git-large-msrvtt` — so a connected
# machine can bring up the REAL teacher through
# `GitForCausalLM.from_pretrained(...)` instead of the azure blob URL.
# These converters map that layout; tests/test_parity_hf.py pins them
# end-to-end (whole-model logits vs transformers' own forward).

def _layer_indices(sd: StateDict, pattern: str) -> int:
    """Count consecutive layer indices for keys like pattern.format(i)."""
    n = 0
    while pattern.format(n) in sd:
        n += 1
    return n


def clip_params_from_hf(sd: StateDict, prefix: str) -> Tuple[Dict, List[str]]:
    """transformers CLIP/GIT vision tower (``<prefix>embeddings...``) →
    :class:`CLIPViT` param tree."""
    used: set = set()
    p = prefix
    params: Dict[str, Any] = {
        "conv1": _conv(sd, p + "embeddings.patch_embedding", used),
        "class_embedding": _t(sd[p + "embeddings.class_embedding"]),
        "positional_embedding": _t(
            sd[p + "embeddings.position_embedding.weight"]),
        "ln_pre": _norm(sd, p + "pre_layrnorm", used),  # HF's spelling
        "ln_post": _norm(sd, p + "post_layernorm", used),
    }
    used.update({p + "embeddings.class_embedding",
                 p + "embeddings.position_embedding.weight",
                 p + "embeddings.position_ids"})  # buffer in older dumps
    layers = _layer_indices(
        sd, p + "encoder.layers.{}.layer_norm1.weight")
    for i in range(layers):
        base = f"{p}encoder.layers.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": _norm(sd, f"{base}.layer_norm1", used),
            "ln_2": _norm(sd, f"{base}.layer_norm2", used),
            "attn": {
                "qkv": _packed_qkv(sd, (f"{base}.self_attn.q_proj",
                                        f"{base}.self_attn.k_proj",
                                        f"{base}.self_attn.v_proj"), used),
                "out_proj": _linear(sd, f"{base}.self_attn.out_proj", used),
            },
            "mlp_fc": _linear(sd, f"{base}.mlp.fc1", used),
            "mlp_proj": _linear(sd, f"{base}.mlp.fc2", used),
        }
    unused = [k for k in sd if k.startswith(p) and k not in used]
    return params, unused


def git_teacher_params_from_hf(sd: StateDict) -> Tuple[Dict, List[str]]:
    """transformers ``GitForCausalLM.state_dict()`` → :class:`GITTeacher`
    param tree. Layer counts / frame count are read off the keys."""
    used: set = set()
    clip, clip_unused = clip_params_from_hf(
        sd, prefix="git.image_encoder.vision_model.")
    params: Dict[str, Any] = {"image_encoder": clip}

    # both spellings: HF used GIT's original `img_temperal_embedding`
    # through 4.56, then fixed the typo
    for spelled in ("git.img_temporal_embedding.{}",
                    "git.img_temperal_embedding.{}"):
        num_frames = _layer_indices(sd, spelled)
        if num_frames:
            break
    for i in range(num_frames):
        key = spelled.format(i)
        params[f"img_temporal_embedding_{i}"] = _t(sd[key]).reshape(1, 1, -1)
        used.add(key)

    tx: Dict[str, Any] = {
        "visual_projection": _linear(
            sd, "git.visual_projection.visual_projection.0", used),
        "visual_ln": _norm(
            sd, "git.visual_projection.visual_projection.1", used),
        "word_embeddings": {
            "embedding": _t(sd["git.embeddings.word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _t(sd["git.embeddings.position_embeddings.weight"])},
        "emb_norm": _norm(sd, "git.embeddings.LayerNorm", used),
    }
    used.update({"git.embeddings.word_embeddings.weight",
                 "git.embeddings.position_embeddings.weight",
                 "git.embeddings.position_ids"})
    # logit head; weight is tied to word embeddings, so safetensors dumps
    # may carry only one copy under either name
    if "output.weight" in sd:
        tx["output"] = _linear(sd, "output", used)
    else:
        tx["output"] = {
            "kernel": _t(sd["git.embeddings.word_embeddings.weight"]).T,
            "bias": _t(sd["output.bias"])}
        used.add("output.bias")
    num_layers = _layer_indices(
        sd, "git.encoder.layer.{}.attention.self.query.weight")
    for i in range(num_layers):
        base = f"git.encoder.layer.{i}"
        tx[f"layer_{i}"] = {
            "qkv": _packed_qkv(sd, (f"{base}.attention.self.query",
                                    f"{base}.attention.self.key",
                                    f"{base}.attention.self.value"), used),
            "attn_out": _linear(sd, f"{base}.attention.output.dense", used),
            "attn_norm": _norm(sd, f"{base}.attention.output.LayerNorm", used),
            "inter": _linear(sd, f"{base}.intermediate.dense", used),
            "out": _linear(sd, f"{base}.output.dense", used),
            "out_norm": _norm(sd, f"{base}.output.LayerNorm", used),
        }
    params["textual"] = tx
    unused = clip_unused + [
        k for k in sd
        if not k.startswith("git.image_encoder.") and k not in used]
    return params, unused


def git_config_from_hf(cfg) -> Dict[str, Any]:
    """transformers ``GitConfig`` (or its dict) → :class:`GITConfig` kwargs."""
    if hasattr(cfg, "to_dict"):
        cfg = cfg.to_dict()
    vis = cfg["vision_config"]
    return dict(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        attention_heads=cfg["num_attention_heads"],
        feedforward_size=cfg["intermediate_size"],
        visual_feature_size=vis["hidden_size"],
        max_caption_length=cfg["max_position_embeddings"],
        num_image_with_embedding=cfg["num_image_with_embedding"] or 1,
        clip_kwargs=dict(
            image_size=vis["image_size"], patch_size=vis["patch_size"],
            width=vis["hidden_size"], layers=vis["num_hidden_layers"],
            heads=vis["num_attention_heads"]),
    )
