"""Full-size fake-checkpoint conversion proofs + torch-replica caption
equality (VERDICT r1 next #5).

Real weights are not downloadable in this sandbox, so conversion fidelity is
proven structurally and numerically instead:

1. generate COMPLETE state dicts with the exact key sets of
   - GIT-Large ``model.pt['model']`` (CLIP ViT-L/14 @224, 24 resblocks,
     6 temporal embeddings, 768-d 6-layer textual head, vocab 30522),
   - timm ``tiny_vit_21m_224`` (incl. the buffers/heads a real checkpoint
     carries: attention_bias_idxs, num_batches_tracked, head / norm_head),
   - a reference Lightning ``DistillationTrainer`` checkpoint (``student.*``
     AND frozen ``teacher.*`` keys, reference io.py:20-23);
   convert each, and assert ZERO unused source keys and ZERO unfilled
   target leaves (exact shape-tree equality vs the model's own init);
2. build a pure-torch functional replica of the WHOLE teacher (CLIP tower →
   temporal embeds → joint prefix-causal textual head) driven by the same
   state dict, and assert teacher-forced logits parity AND greedy caption
   equality (full-recompute torch loop vs the JAX KV-cache decode path).
"""

import functools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rtvc_tpu.models import convert
from rtvc_tpu.models.clip_vit import CLIPViTConfig
from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher
from rtvc_tpu.models.student import StudentCandidateV1
from rtvc_tpu.models.tinyvit import TinyViT, tiny_vit_21m_config

from test_convert import _fake_tinyvit_sd


# ---------------------------------------------------------------------------
# fake state-dict generators (parametric in config, zeros for full-size
# shape proofs, random for numerical parity)
# ---------------------------------------------------------------------------

def make_git_sd(c: GITConfig, random: bool = False) -> dict:
    """Exact key set of GIT's ``model.pt['model']`` for this config."""
    g = torch.Generator().manual_seed(0)

    def tensor(*shape):
        if random:
            return torch.randn(*shape, generator=g) * 0.05
        return torch.zeros(*shape)

    sd = {}

    def linear(prefix, cin, cout):
        sd[f"{prefix}.weight"] = tensor(cout, cin)
        sd[f"{prefix}.bias"] = tensor(cout)

    def norm(prefix, n):
        sd[f"{prefix}.weight"] = tensor(n) + 1.0
        sd[f"{prefix}.bias"] = tensor(n)

    w = c.clip.width
    sd["image_encoder.conv1.weight"] = tensor(w, 3, c.clip.patch_size,
                                              c.clip.patch_size)
    sd["image_encoder.class_embedding"] = tensor(w)
    grid = c.clip.image_size // c.clip.patch_size
    sd["image_encoder.positional_embedding"] = tensor(grid * grid + 1, w)
    norm("image_encoder.ln_pre", w)
    norm("image_encoder.ln_post", w)
    for i in range(c.clip.layers):
        base = f"image_encoder.transformer.resblocks.{i}"
        norm(f"{base}.ln_1", w)
        norm(f"{base}.ln_2", w)
        sd[f"{base}.attn.in_proj_weight"] = tensor(3 * w, w)
        sd[f"{base}.attn.in_proj_bias"] = tensor(3 * w)
        linear(f"{base}.attn.out_proj", w, w)
        linear(f"{base}.mlp.c_fc", w, 4 * w)
        linear(f"{base}.mlp.c_proj", 4 * w, w)
    for i in range(c.num_image_with_embedding):
        sd[f"img_temperal_embedding.{i}"] = tensor(1, 1, c.visual_feature_size)
    linear("textual.visual_projection.0", c.visual_feature_size,
           c.hidden_size)
    norm("textual.visual_projection.1", c.hidden_size)
    sd["textual.embedding.words.weight"] = tensor(c.vocab_size, c.hidden_size)
    sd["textual.embedding.positions.weight"] = tensor(c.max_caption_length,
                                                      c.hidden_size)
    norm("textual.embedding.layer_norm", c.hidden_size)
    for i in range(c.num_layers):
        base = f"textual.transformer.encoder.layer.{i}"
        linear(f"{base}.attention.self.query", c.hidden_size, c.hidden_size)
        linear(f"{base}.attention.self.key", c.hidden_size, c.hidden_size)
        linear(f"{base}.attention.self.value", c.hidden_size, c.hidden_size)
        linear(f"{base}.attention.output.dense", c.hidden_size, c.hidden_size)
        norm(f"{base}.attention.output.LayerNorm", c.hidden_size)
        linear(f"{base}.intermediate.dense", c.hidden_size,
               c.feedforward_size)
        linear(f"{base}.output.dense", c.feedforward_size, c.hidden_size)
        norm(f"{base}.output.LayerNorm", c.hidden_size)
    linear("textual.output", c.hidden_size, c.vocab_size)
    return sd


def _shapes(tree):
    return jax.tree.map(lambda a: tuple(np.shape(a)), tree)


# ---------------------------------------------------------------------------
# 1. full-size conversion proofs (zero unused, zero unfilled)
# ---------------------------------------------------------------------------

def test_git_large_fullsize_conversion():
    """GIT-Large scale: 24 CLIP ViT-L/14 layers, 6 frames, vocab 30522."""
    c = GITConfig()  # the real teacher config (reference parameter.yaml)
    assert c.clip.layers == 24 and c.num_image_with_embedding == 6
    sd = make_git_sd(c)
    params, unused = convert.git_teacher_params_from_torch(
        sd, num_layers=c.num_layers, clip_layers=c.clip.layers,
        num_frames=c.num_image_with_embedding)
    assert unused == []

    teacher = GITTeacher(c)
    frames = jax.ShapeDtypeStruct((1, 6, 224, 224, 3), jnp.float32)
    caps = jax.ShapeDtypeStruct((1, 40), jnp.int32)
    ref = jax.eval_shape(teacher.init, jax.random.PRNGKey(0), frames, caps)
    assert _shapes(ref["params"]) == _shapes(params)  # zero unfilled leaves


def test_timm_tinyvit_21m_fullsize_conversion():
    """timm tiny_vit_21m_224 at full scale, including the buffer/head keys a
    real checkpoint carries — the converter must consume every weight and
    ignore exactly the non-weight extras."""
    cfg = tiny_vit_21m_config()
    sd = _fake_tinyvit_sd(cfg, input_size=224)
    # extras present in real timm checkpoints
    extra = {}
    for k in list(sd):
        if k.endswith("attention_biases"):
            extra[k.replace("attention_biases", "attention_bias_idxs")] = \
                torch.zeros(1, dtype=torch.long)
        if k.endswith("bn.running_mean"):
            extra[k.replace("running_mean", "num_batches_tracked")] = \
                torch.zeros((), dtype=torch.long)
    extra["norm_head.weight"] = torch.ones(cfg.embed_dims[-1])
    extra["norm_head.bias"] = torch.zeros(cfg.embed_dims[-1])
    extra["head.weight"] = torch.zeros(1000, cfg.embed_dims[-1])
    extra["head.bias"] = torch.zeros(1000)
    sd.update(extra)

    params, stats, unused = convert.tinyvit_params_from_torch(
        sd, depths=cfg.depths)
    assert unused == []

    model = TinyViT(cfg)
    x = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    assert _shapes(ref["params"]) == _shapes(params)
    assert _shapes(ref["batch_stats"]) == _shapes(stats)


def test_lightning_student_fullsize_conversion():
    """A full DistillationTrainer checkpoint: student.* keys (TinyViT-21M +
    2 decoder layers d=576 + vocab 30522 + all 7 distillation projectors +
    buffers) AND the frozen teacher.* keys, which must be excluded exactly
    like the reference loader (io.py:20-23)."""
    enc_cfg = tiny_vit_21m_config()
    d_model, n_head, ffn, vocab = 576, 8, 1024, 30522
    sd = {f"student.image_encoder.model.{k}": v
          for k, v in _fake_tinyvit_sd(enc_cfg, input_size=224).items()}

    def linear(prefix, cin, cout):
        sd[f"{prefix}.weight"] = torch.zeros(cout, cin)
        sd[f"{prefix}.bias"] = torch.zeros(cout)

    for i in range(2):
        base = f"student.decoder.layers.{i}"
        for attn in ("self_attn", "multihead_attn"):
            sd[f"{base}.{attn}.in_proj_weight"] = torch.zeros(3 * d_model,
                                                              d_model)
            sd[f"{base}.{attn}.in_proj_bias"] = torch.zeros(3 * d_model)
            linear(f"{base}.{attn}.out_proj", d_model, d_model)
        linear(f"{base}.linear1", d_model, ffn)
        linear(f"{base}.linear2", ffn, d_model)
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{base}.{n}.weight"] = torch.ones(d_model)
            sd[f"{base}.{n}.bias"] = torch.zeros(d_model)
    sd["student.embed.weight"] = torch.zeros(vocab, d_model)
    linear("student.linear", d_model, vocab)
    # 7 distillation projectors (reference model.py:87-94)
    for i, c in enumerate(enc_cfg.embed_dims):
        linear(f"student.projectors.{i}", c, 1024)
    linear("student.upsample", 6, 1542)
    linear("student.project", d_model, 1024)
    linear("student.project_decoder", d_model, 768)
    # buffers a real checkpoint carries
    sd["student.pos_enc.pe"] = torch.zeros(1, 500, d_model)
    # frozen teacher weights also live in the Lightning state dict
    for k, v in make_git_sd(GITConfig()).items():
        sd[f"teacher.model.{k}"] = v

    params, stats, unused = convert.student_params_from_torch(
        sd, num_decoder_layers=2, encoder_depths=enc_cfg.depths)
    assert unused == []

    student = StudentCandidateV1(encoder_config=enc_cfg)
    frames = jax.ShapeDtypeStruct((1, 6, 224, 224, 3), jnp.float32)
    caps = jax.ShapeDtypeStruct((1, 40), jnp.int32)
    init = functools.partial(student.init,
                             method=StudentCandidateV1.full_init)
    ref = jax.eval_shape(init, jax.random.PRNGKey(0), frames, caps)
    assert _shapes(ref["params"]) == _shapes(params)
    assert _shapes(ref["batch_stats"]) == _shapes(stats)

    # Param-count reconciliation (VERDICT r3 weak #7): the reference
    # student's sum(p.numel()) — buffers (BN running stats, attention bias
    # index tables, the positional-encoding table) excluded, exactly what
    # torch's parameters() iterates — equals the JAX params tree leaf-sum.
    # 65.83M full training graph; bench.py's 63.49M is the INFERENCE
    # subgraph (the 7 distillation projectors' ~2.34M never run at
    # serve time). SURVEY §2b's "~33M" note was wrong: the untied vocab
    # embed + head are 35.19M on their own (30522 x 576 x 2 + bias).
    buffer_markers = ("running_mean", "running_var", "num_batches_tracked",
                      "attention_bias_idxs", "pos_enc.pe")
    torch_numel = sum(
        v.numel() for k, v in sd.items()
        if k.startswith("student.")
        and not any(m in k for m in buffer_markers))
    jax_numel = sum(int(np.prod(l.shape))
                    for l in jax.tree.leaves(ref["params"]))
    assert torch_numel == jax_numel == 65_826_148


# ---------------------------------------------------------------------------
# 2. torch-replica teacher: logits parity + greedy caption equality
# ---------------------------------------------------------------------------

def _torch_ln(x, sd, prefix, eps):
    return torch.nn.functional.layer_norm(
        x, x.shape[-1:], sd[f"{prefix}.weight"], sd[f"{prefix}.bias"], eps)


def _torch_linear(x, sd, prefix):
    return torch.nn.functional.linear(x, sd[f"{prefix}.weight"],
                                      sd[f"{prefix}.bias"])


def _torch_mha(q, k, v, heads, mask=None):
    b, lq, w = q.shape
    hd = w // heads
    q = q.view(b, lq, heads, hd).transpose(1, 2)
    k = k.view(b, k.shape[1], heads, hd).transpose(1, 2)
    v = v.view(b, v.shape[1], heads, hd).transpose(1, 2)
    scores = q @ k.transpose(-1, -2) / hd ** 0.5
    if mask is not None:
        scores = scores.masked_fill(~mask, float("-inf"))
    out = torch.softmax(scores, dim=-1) @ v
    return out.transpose(1, 2).reshape(b, lq, w)


def torch_clip_forward(sd, x_nhwc, c: CLIPViTConfig):
    """Pure-torch CLIP tower on `image_encoder.*` keys (pre-LN, QuickGELU)."""
    x = torch.nn.functional.conv2d(
        x_nhwc.permute(0, 3, 1, 2), sd["image_encoder.conv1.weight"],
        stride=c.patch_size)
    b = x.shape[0]
    x = x.flatten(2).transpose(1, 2)                     # [B, grid², W]
    cls = sd["image_encoder.class_embedding"].expand(b, 1, c.width)
    x = torch.cat([cls, x], dim=1)
    x = x + sd["image_encoder.positional_embedding"][None]
    x = _torch_ln(x, sd, "image_encoder.ln_pre", 1e-5)
    for i in range(c.layers):
        base = f"image_encoder.transformer.resblocks.{i}"
        h = _torch_ln(x, sd, f"{base}.ln_1", 1e-5)
        qkv = torch.nn.functional.linear(h, sd[f"{base}.attn.in_proj_weight"],
                                         sd[f"{base}.attn.in_proj_bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        attn = _torch_mha(q, k, v, c.heads)
        x = x + _torch_linear(attn, sd, f"{base}.attn.out_proj")
        h = _torch_ln(x, sd, f"{base}.ln_2", 1e-5)
        h = _torch_linear(h, sd, f"{base}.mlp.c_fc")
        h = h * torch.sigmoid(1.702 * h)                 # QuickGELU
        x = x + _torch_linear(h, sd, f"{base}.mlp.c_proj")
    return _torch_ln(x, sd, "image_encoder.ln_post", 1e-5)


def torch_teacher_logits(sd, frames, tokens, c: GITConfig):
    """Pure-torch full teacher: CLIP per frame + temporal embeds + joint
    prefix-causal BERT decoder (post-norm, exact GELU)."""
    b, f = frames.shape[:2]
    flat = frames.reshape(b * f, *frames.shape[2:])
    vis = torch_clip_forward(sd, flat, c.clip)
    n_tok = vis.shape[1]
    vis = vis.view(b, f, n_tok, c.visual_feature_size)
    vis = torch.cat([vis[:, i] + sd[f"img_temperal_embedding.{i}"]
                     for i in range(f)], dim=1)          # [B, F*T, 1024]
    x = _torch_linear(vis, sd, "textual.visual_projection.0")
    x = _torch_ln(x, sd, "textual.visual_projection.1", 1e-12)
    p = x.shape[1]
    t = tokens.shape[1]
    emb = sd["textual.embedding.words.weight"][tokens]
    emb = emb + sd["textual.embedding.positions.weight"][:t][None]
    emb = _torch_ln(emb, sd, "textual.embedding.layer_norm", 1e-12)
    x = torch.cat([x, emb], dim=1)
    # prefix-causal joint mask: visual sees visual; text sees visual + past
    total = p + t
    mask = torch.ones(total, total, dtype=torch.bool).tril()
    mask[:, :p] = True
    mask = mask[None, None]
    for i in range(c.num_layers):
        base = f"textual.transformer.encoder.layer.{i}"
        q = _torch_linear(x, sd, f"{base}.attention.self.query")
        k = _torch_linear(x, sd, f"{base}.attention.self.key")
        v = _torch_linear(x, sd, f"{base}.attention.self.value")
        attn = _torch_mha(q, k, v, c.attention_heads, mask)
        h = _torch_linear(attn, sd, f"{base}.attention.output.dense")
        x = _torch_ln(x + h, sd, f"{base}.attention.output.LayerNorm", 1e-12)
        h = _torch_linear(x, sd, f"{base}.intermediate.dense")
        h = torch.nn.functional.gelu(h)                  # exact GELU
        h = _torch_linear(h, sd, f"{base}.output.dense")
        x = _torch_ln(x + h, sd, f"{base}.output.LayerNorm", 1e-12)
    return _torch_linear(x[:, p:], sd, "textual.output")


MID = GITConfig(vocab_size=211, hidden_size=32, num_layers=2,
                attention_heads=4, feedforward_size=64,
                visual_feature_size=64, max_caption_length=32,
                num_image_with_embedding=2,
                clip=CLIPViTConfig(image_size=32, patch_size=16, width=64,
                                   layers=3, heads=4))


@pytest.fixture(scope="module")
def mid_teacher():
    sd = make_git_sd(MID, random=True)
    params, unused = convert.git_teacher_params_from_torch(
        sd, num_layers=MID.num_layers, clip_layers=MID.clip.layers,
        num_frames=MID.num_image_with_embedding)
    assert unused == []
    return sd, GITTeacher(MID), {"params": params}


def test_teacher_forced_logits_parity_torch_replica(mid_teacher):
    """The converted JAX teacher reproduces the torch replica's
    teacher-forced logits through the ENTIRE tower."""
    sd, teacher, variables = mid_teacher
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
    caps = np.array([[101, 9, 55, 7], [101, 30, 2, 0]], np.int64)

    with torch.no_grad():
        want = torch_teacher_logits(sd, torch.tensor(frames),
                                    torch.tensor(caps), MID).numpy()
    with jax.default_matmul_precision("highest"):
        got = teacher.apply(variables, jnp.asarray(frames),
                            jnp.asarray(caps.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)
    # caption-level equality under teacher forcing
    assert (np.argmax(np.asarray(got), -1) == np.argmax(want, -1)).all()


def test_greedy_caption_equality_torch_replica(mid_teacher):
    """Greedy captions: the torch replica's full-recompute argmax loop and
    the JAX KV-cache decode path must emit IDENTICAL token sequences."""
    sd, teacher, variables = mid_teacher
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(2, 2, 32, 32, 3)).astype(np.float32)
    steps = 8

    # torch: grow the sequence, recompute the whole joint forward each step
    tokens = torch.full((2, 1), 101, dtype=torch.long)
    with torch.no_grad():
        for _ in range(steps):
            logits = torch_teacher_logits(sd, torch.tensor(frames), tokens,
                                          MID)
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            tokens = torch.cat([tokens, nxt], dim=1)
    want = tokens.numpy()[:, 1:]

    # jax: visual prefill + incremental KV-cache decode_step
    with jax.default_matmul_precision("highest"):
        visual = teacher.apply(variables, jnp.asarray(frames),
                               method=lambda m, f: m.encode_only(f))
        caches = teacher.apply(
            variables, visual, steps + 1,
            method=lambda m, v, t: m.init_cache(v, t))
        prefix = visual.shape[1]
        tok = jnp.full((2,), 101, jnp.int32)
        got = []
        for i in range(steps):
            logits, caches = teacher.apply(
                variables, tok, jnp.int32(i), caches, prefix,
                method=lambda m, t_, i_, c_, p_: m.decode_step(t_, i_, c_, p_))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            got.append(np.asarray(tok))
    got = np.stack(got, axis=1)
    np.testing.assert_array_equal(got, want)
