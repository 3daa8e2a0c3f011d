"""Full-model parity vs HuggingFace's independent implementations.

tests/test_parity_torch.py pins single blocks against hand-built torch
replicas; these tests go further and pin WHOLE MODELS against
transformers' own modules (random weights, f32, CPU) — an oracle nobody
in this repo wrote:

- ``CLIPViT`` vs ``transformers.CLIPVisionModel`` — the GIT teacher's
  frame encoder. The reference reached the same architecture through
  ``generativeimage2text``'s CLIP fork (reference src/models/model.py:
  682-685); HF's CLIPVisionModel was converted from the same OpenAI
  weights, so its forward is an exact behavioral spec. GIT's variant
  returns the full post-LN token grid, which equals
  ``post_layernorm(last_hidden_state)`` here.

- ``GITTeacher`` vs ``transformers.GitForCausalLM`` — HF's GIT was
  converted from (and output-validated against) the same microsoft
  GenerativeImage2Text codebase the reference builds its teacher from
  (reference model.py:680-718), including the video path: per-frame
  temporal embeddings added to VISION-width tokens, concat, linearLn
  projection (eps 1e-5), BERT embeddings/layers (eps 1e-12),
  prefix-causal joint attention, 30522-way head over text positions.
  Matching HF's GitForCausalLM logits therefore pins our whole
  teacher-forced path against the reference's.

The weight mapping under test is the SHIPPED converter
(``convert.clip_params_from_hf`` / ``convert.git_teacher_params_from_hf``)
— the same functions a connected machine uses to bring up the real
``microsoft/git-large-msrvtt`` weights (converted by transformers from
the reference's own GIT_LARGE_MSRVTT model.pt snapshot). Any
transposition/ordering mistake in our modules or the converter shows up
as a numeric mismatch on random inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rtvc_tpu.models import convert  # noqa: E402
from rtvc_tpu.models.clip_vit import CLIPViT, CLIPViTConfig  # noqa: E402


def _n(t):
    return np.asarray(t.detach().cpu().numpy())


def _clip_vision_params(module, prefix):
    """Run the shipped HF converter over the module's state dict."""
    params, unused = convert.clip_params_from_hf(
        {k: v for k, v in module.state_dict().items()}, prefix=prefix)
    assert not unused, unused
    return jax.tree.map(jnp.asarray, params)


@pytest.mark.parametrize("width,heads,layers", [(64, 4, 3)])
def test_clip_vit_matches_hf_clip_vision(width, heads, layers):
    torch.manual_seed(0)
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=width, intermediate_size=4 * width,
        num_hidden_layers=layers, num_attention_heads=heads,
        image_size=32, patch_size=16, hidden_act="quick_gelu",
        layer_norm_eps=1e-5, attention_dropout=0.0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()

    ours = CLIPViT(CLIPViTConfig(image_size=32, patch_size=16, width=width,
                                 layers=layers, heads=heads))
    params = _clip_vision_params(hf, prefix="vision_model.")

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(x),
                 output_hidden_states=True)
        # GIT's encoder variant: full token grid after the final LN
        want = _n(hf.vision_model.post_layernorm(out.last_hidden_state))

    taps_at = list(range(layers))
    got, taps = ours.apply({"params": params}, jnp.asarray(x),
                           block_indices=taps_at)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    # our per-block taps (the distillation hook points, reference
    # model.py:844-847) == HF's hidden_states after each encoder layer
    assert len(taps) == layers
    for i, tap in enumerate(taps):
        np.testing.assert_allclose(
            np.asarray(tap), _n(out.hidden_states[i + 1]),
            rtol=2e-5, atol=2e-5, err_msg=f"block {i}")


def _git_teacher_params(hf):
    """Run the shipped HF converter over GitForCausalLM's state dict."""
    params, unused = convert.git_teacher_params_from_hf(
        {k: v for k, v in hf.state_dict().items()})
    assert not unused, unused
    return jax.tree.map(jnp.asarray, params)


def test_git_teacher_matches_hf_git_video():
    """Whole teacher-forced video forward: frames + caption -> logits."""
    torch.manual_seed(0)
    frames, width, layers = 3, 64, 2
    hf_cfg = transformers.GitConfig(
        vision_config=dict(hidden_size=width, intermediate_size=4 * width,
                           num_hidden_layers=layers, num_attention_heads=4,
                           image_size=32, patch_size=16,
                           hidden_act="quick_gelu", layer_norm_eps=1e-5),
        vocab_size=99, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=192,
        max_position_embeddings=64, hidden_act="gelu",
        layer_norm_eps=1e-12, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_image_with_embedding=frames)
    hf = transformers.GitForCausalLM(hf_cfg).eval()
    # random temporal embeddings (HF inits them zero, which would hide a
    # frame-indexing mismatch)
    with torch.no_grad():
        for emb in hf.git.img_temporal_embedding:
            emb.copy_(torch.randn_like(emb) * 0.1)

    from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher

    cfg = GITConfig(
        vocab_size=99, hidden_size=48, num_layers=2, attention_heads=4,
        feedforward_size=192, visual_feature_size=width,
        max_caption_length=64, num_image_with_embedding=frames, dropout=0.0,
        clip=CLIPViTConfig(image_size=32, patch_size=16, width=width,
                           layers=layers, heads=4))
    ours = GITTeacher(cfg)
    params = _git_teacher_params(hf)

    rng = np.random.RandomState(2)
    pixel = rng.randn(2, frames, 3, 32, 32).astype(np.float32)
    tokens = rng.randint(0, 99, size=(2, 7))

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(tokens),
                 pixel_values=torch.from_numpy(pixel))
    # HF emits logits over the full [visual; text] sequence; ours only over
    # text positions (the reference's forward_output_logits semantics)
    n_visual = frames * ((32 // 16) ** 2 + 1)
    assert out.logits.shape[1] == n_visual + tokens.shape[1]
    want = _n(out.logits[:, n_visual:])

    got = ours.apply({"params": params}, jnp.asarray(pixel),
                     jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-5)

    # --- incremental decode path vs HF's KV-cached generate ---------------
    # Pins the visual-prefix cache semantics (GIT's prev_encoded_layers:
    # layer i's cached visual K/V come from layer i-1's VISUAL-ONLY hidden
    # states, git_teacher.py init_cache) against HF's past_key_values
    # greedy decode — token-exact and per-step-logit-exact.
    cls_id, steps = 1, 5
    with torch.no_grad():
        gen = hf.generate(
            pixel_values=torch.from_numpy(pixel),
            input_ids=torch.full((2, 1), cls_id, dtype=torch.long),
            do_sample=False, num_beams=1, max_new_tokens=steps,
            eos_token_id=None, pad_token_id=0, use_cache=True,
            output_scores=True, return_dict_in_generate=True)

    visual = ours.apply({"params": params}, jnp.asarray(pixel),
                        method=lambda m, f: m.encode_only(f))
    caches = ours.apply({"params": params}, visual, steps + 1,
                        method=lambda m, v, t: m.init_cache(v, t))
    tok = jnp.full((2,), cls_id, jnp.int32)
    for t in range(steps):
        step_logits, caches = ours.apply(
            {"params": params}, tok, jnp.int32(t), caches, n_visual,
            method=lambda m, t_, i_, c_, p_: m.decode_step(t_, i_, c_, p_))
        np.testing.assert_allclose(np.asarray(step_logits),
                                   _n(gen.scores[t]), rtol=3e-5, atol=3e-5,
                                   err_msg=f"step {t}")
        tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok),
                                      _n(gen.sequences[:, t + 1]),
                                      err_msg=f"token {t}")


def test_top_k_top_p_filtering_matches_hf_warpers():
    """decode.top_k_top_p_filtering vs transformers' TopKLogitsWarper /
    TopPLogitsWarper — the modern form of the exact legacy HF function the
    reference's sampling beam vendored via generativeimage2text
    (reference model.py:537). Fuzzed over k/p combinations; -inf patterns
    must coincide and surviving logits pass through untouched."""
    from transformers.generation import TopKLogitsWarper, TopPLogitsWarper

    from rtvc_tpu.decode import top_k_top_p_filtering

    rng = np.random.RandomState(7)
    for trial in range(20):
        logits = rng.randn(3, 50).astype(np.float32) * 3
        top_k = int(rng.choice([0, 1, 3, 10, 49]))
        top_p = float(rng.choice([0.0, 0.1, 0.5, 0.9, 0.99]))
        keep = int(rng.choice([1, 2]))

        want = torch.from_numpy(logits)
        if top_k > 0:
            want = TopKLogitsWarper(
                top_k, min_tokens_to_keep=keep)(None, want)
        if top_p > 0.0:
            want = TopPLogitsWarper(
                top_p, min_tokens_to_keep=keep)(None, want)
        want = want.numpy()

        got = np.asarray(top_k_top_p_filtering(
            jnp.asarray(logits), top_k=top_k, top_p=top_p,
            min_tokens_to_keep=keep))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=f"trial {trial} k={top_k} "
                                           f"p={top_p} keep={keep}")
