"""Model shape/behavior tests on tiny configs (CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu.models.clip_vit import CLIPViT, CLIPViTConfig
from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher
from rtvc_tpu.models.layers import sinusoidal_position_encoding
from rtvc_tpu.models.student import StudentCandidateV1
from rtvc_tpu.models.tinyvit import TinyViT, TinyViTConfig

TINY_ENC = TinyViTConfig(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                         num_heads=(1, 2, 2, 2), window_sizes=(4, 4, 4, 4),
                         drop_path_rate=0.0)

TINY_CLIP = CLIPViTConfig(image_size=28, patch_size=14, width=32, layers=3,
                          heads=2)

TINY_GIT = GITConfig(vocab_size=211, hidden_size=16, num_layers=2,
                     attention_heads=2, feedforward_size=32,
                     visual_feature_size=32, max_caption_length=64,
                     num_image_with_embedding=2, clip=TINY_CLIP)


def tiny_student(**kw):
    defaults = dict(d_model=32, n_head=4, d_ffn=64, dropout=0.1,
                    num_decoder_layers=2, vocab_size=211, max_pos_len=64,
                    encoder_config=TINY_ENC, teacher_visual_dim=32,
                    teacher_num_tokens=10, teacher_hidden=16)
    defaults.update(kw)
    return StudentCandidateV1(**defaults)


def test_positional_encoding_table():
    pe = sinusoidal_position_encoding(10, 8)
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(pe[0], [0, 1, 0, 1, 0, 1, 0, 1], atol=1e-6)
    # pe[pos, 0] = sin(pos)
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), atol=1e-6)


def test_tinyvit_stage_shapes():
    model = TinyViT(TINY_ENC)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    fmaps = model.apply(variables, x)
    assert [f.shape for f in fmaps] == [
        (2, 16, 16, 8), (2, 8, 8, 16), (2, 4, 4, 24), (2, 2, 2, 32)]


def test_tinyvit_gelu_approximate_close():
    """cfg.gelu_approximate swaps erf GELU for tanh GELU: same params,
    same shapes, small numeric delta (the perf A/B knob, PERF.md §1b)."""
    import dataclasses
    exact = TinyViT(TINY_ENC)
    approx = TinyViT(dataclasses.replace(TINY_ENC, gelu_approximate=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = exact.init(jax.random.PRNGKey(0), x)
    out_e = exact.apply(variables, x)
    out_a = approx.apply(variables, x)  # identical param tree
    for a, b in zip(out_e, out_a):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.1)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(out_e, out_a))


def test_tinyvit_batchnorm_updates():
    model = TinyViT(TINY_ENC)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_student_forward_shapes():
    model = tiny_student()
    frames = jnp.zeros((2, 3, 64, 64, 3))  # B=2, F=3
    y = jnp.array([[101, 5, 6, 0], [101, 7, 0, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, y)
    outs = model.apply(variables, frames, y)
    assert len(outs) == 5  # 4 fmaps + logits (reference model.py:106-112)
    assert outs[-1].shape == (2, 4, 211)
    # memory: spatial mean of last stage, [B, F, d_model]
    _, memory = model.apply(variables, frames,
                            method=lambda m, x: m.forward_image_enc(x))
    assert memory.shape == (2, 3, 32)


def test_student_accepts_nchw():
    model = tiny_student()
    frames_nhwc = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 64, 64, 3))
    frames_nchw = jnp.transpose(frames_nhwc, (0, 1, 4, 2, 3))
    y = jnp.array([[101, 5]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames_nhwc, y)
    out1 = model.apply(variables, frames_nhwc, y)[-1]
    out2 = model.apply(variables, frames_nchw, y)[-1]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_student_projectors():
    model = tiny_student()
    frames = jnp.zeros((2, 3, 64, 64, 3))
    y = jnp.array([[101, 5], [101, 6]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, y,
                           method=StudentCandidateV1.full_init)
    fmaps, _ = model.apply(variables, frames,
                           method=lambda m, x: m.forward_image_enc(x))
    proj = model.apply(variables, fmaps,
                       method=lambda m, f: m.project_stage_means(f))
    assert len(proj) == 4
    assert all(p.shape == (6, 32) for p in proj)  # B*F rows, teacher width
    # loss-4 heads: [B, teacher_tokens, teacher_width]
    _, _, _, vis = model.apply(variables, frames, y,
                               method=StudentCandidateV1.full_init)
    assert vis.shape == (2, 10, 32)


def test_student_dropout_active_in_train():
    model = tiny_student(dropout=0.5)
    frames = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64, 64, 3))
    y = jnp.array([[101, 5, 6]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, y)
    out_det = model.apply(variables, frames, y)[-1]
    out_tr, _ = model.apply(variables, frames, y, True,
                            rngs={"dropout": jax.random.PRNGKey(7)},
                            mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out_det), np.asarray(out_tr[-1]))


def test_clip_vit_token_shapes():
    model = CLIPViT(TINY_CLIP)
    x = jnp.zeros((2, 28, 28, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    tokens, taps = model.apply(variables, x, (0, 2))
    assert tokens.shape == (2, 5, 32)  # 1 CLS + 2x2 patches
    assert len(taps) == 2 and taps[0].shape == (2, 5, 32)


def test_git_teacher_forward():
    model = GITTeacher(TINY_GIT)
    frames = jnp.zeros((2, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 6, 102], [101, 7, 102, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, caps)
    logits, visual, hidden, cls_taps = model.apply(
        variables, frames, caps, (0, 1),
        method=lambda m, f, c, b: m.forward_output_logits(f, c, b))
    assert logits.shape == (2, 4, 211)
    assert visual.shape == (2, 2 * 5, 32)  # F frames x 5 tokens
    assert len(hidden) == 2
    assert hidden[0].shape == (2, 10 + 4, 16)  # joint [visual; text]
    assert len(cls_taps) == 2 and cls_taps[0].shape == (2, 2, 32)


def test_git_prefix_causal_mask_semantics():
    """Text token t must not see text tokens > t but must see all visual."""
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 6, 7]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, caps)
    logits1 = model.apply(variables, frames, caps)
    # changing a FUTURE caption token must not change earlier logits
    caps2 = caps.at[0, 3].set(9)
    logits2 = model.apply(variables, frames, caps2)
    np.testing.assert_allclose(np.asarray(logits1[0, :3]),
                               np.asarray(logits2[0, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(logits1[0, 3]),
                           np.asarray(logits2[0, 3]))


def test_image_encoder_factory():
    from rtvc_tpu.models.clip_vit import get_image_encoder
    import pytest as _pytest

    enc = get_image_encoder("CLIPViT_B_16", input_resolution=224, width=32,
                            layers=2, heads=2)
    x = jnp.zeros((1, 224, 224, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    tokens, _ = enc.apply(variables, x)
    assert tokens.shape == (1, 14 * 14 + 1, 32)  # B/16 grid: 197 tokens
    with _pytest.raises(ValueError):
        get_image_encoder("NotAnEncoder")


def test_get_git_model_factory():
    from rtvc_tpu.models.git_teacher import get_git_model

    # GIT_LARGE_MSRVTT parameter.yaml content
    param = {"num_image_with_embedding": 6, "visual_feature_size": 1024,
             "image_encoder_type": "CLIPViT_L_14"}
    model = get_git_model(param)
    assert model.config.visual_feature_size == 1024
    assert model.config.num_image_with_embedding == 6
    assert model.config.clip.patch_size == 14
    # factory default mirrors the reference: CLIPViT_B_16, vfs 768
    base = get_git_model({})
    assert base.config.clip.patch_size == 16
    assert base.config.visual_feature_size == 768


@pytest.mark.slow
def test_remat_encoder_same_outputs():
    frames = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 64, 64, 3))
    y = jnp.array([[101, 5, 6]], jnp.int32)
    plain = tiny_student(dropout=0.0)
    remat = tiny_student(dropout=0.0, remat_encoder=True)
    variables = plain.init(jax.random.PRNGKey(0), frames, y)
    out_a = plain.apply(variables, frames, y)[-1]
    out_b = remat.apply(variables, frames, y)[-1]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5, rtol=1e-5)

    # remat path must be differentiable
    def loss(params):
        out = remat.apply({"params": params,
                           "batch_stats": variables.get("batch_stats", {})},
                          frames, y, True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])[0][-1]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
