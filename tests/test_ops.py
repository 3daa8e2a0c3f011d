"""Attention / masking / preprocessing op tests (CPU, 8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu.ops import (
    create_causal_mask,
    create_padding_mask,
    multi_head_attention,
)
from rtvc_tpu.ops.attention import (_pallas_attention, _pallas_attention_bwd,
                                    xla_attention)
from rtvc_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, clip_preprocess


def test_padding_mask():
    seq = jnp.array([[1, 2, 0, 0], [3, 0, 0, 0]])
    mask = create_padding_mask(seq)
    np.testing.assert_array_equal(
        np.asarray(mask),
        [[False, False, True, True], [False, True, True, True]])


def test_causal_mask():
    m = create_causal_mask(4)
    assert not m[2, 1] and not m[2, 2]
    assert m[2, 3]  # future masked


def _rand_qkv(key, b=2, h=4, lq=13, lkv=21, d=24):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, lq, d), jnp.float32)
    k = jax.random.normal(k2, (b, h, lkv, d), jnp.float32)
    v = jax.random.normal(k3, (b, h, lkv, d), jnp.float32)
    return q, k, v


def _naive_attention(q, k, v, causal=False, prefix_len=0, kv_mask=None):
    scale = q.shape[-1] ** -0.5
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    lq, lkv = s.shape[2], s.shape[3]
    if causal:
        qi = np.arange(lq)[:, None]
        ki = np.arange(lkv)[None, :]
        allowed = (ki < prefix_len) | (ki <= qi)
        s = np.where(allowed[None, None], s, -1e30)
    if kv_mask is not None:
        s = np.where(kv_mask[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal,prefix", [(False, 0), (True, 0), (True, 7)])
def test_xla_attention_matches_naive(causal, prefix):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    kv_mask = jnp.arange(21)[None, :] < jnp.array([[21], [15]])
    # parity check at full precision (default matmul precision truncates
    # inputs to bf16-like even on CPU — that's the intended fast path, but
    # reference comparisons need exact matmuls)
    with jax.default_matmul_precision("highest"):
        out = xla_attention(q, k, v, causal=causal, prefix_len=prefix,
                            kv_mask=kv_mask)
    ref = _naive_attention(np.asarray(q), np.asarray(k), np.asarray(v),
                           causal=causal, prefix_len=prefix,
                           kv_mask=np.asarray(kv_mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_softmax_in_input_dtype_close_and_f32_noop():
    """The window-attention fast path (softmax in compute dtype,
    PERF.md §1b lever 2): bf16 scores/softmax stay close to the f32
    path, and at f32 inputs the flag is a bitwise no-op (acc dtype
    follows q.dtype), so parity-mode runs are unchanged."""
    key = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(kk, (4, 6, 49, 32)) * 0.5
               for kk in jax.random.split(key, 3))
    bias = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 49, 49)) * 0.1
    ref = xla_attention(q, k, v, bias=bias)
    f32_fast = xla_attention(q, k, v, bias=bias, softmax_in_input_dtype=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(f32_fast))
    bf = xla_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                       v.astype(jnp.bfloat16), bias=bias,
                       softmax_in_input_dtype=True)
    np.testing.assert_allclose(np.asarray(bf, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("causal,prefix", [(False, 0), (True, 0), (True, 7)])
def test_pallas_attention_interpret_matches_xla(causal, prefix):
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), lq=130, lkv=140, d=72)
    kv_mask = jnp.arange(140)[None, :] < jnp.array([[140], [100]])
    with jax.default_matmul_precision("highest"):
        out_p = _pallas_attention(q, k, v, kv_mask, causal=causal,
                                  prefix_len=prefix, scale=72 ** -0.5,
                                  interpret=True)
        out_x = xla_attention(q, k, v, causal=causal, prefix_len=prefix,
                              kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5, rtol=2e-5)


def test_pallas_native_score_dot_parity():
    """native_score_dot feeds raw bf16 operands to the score matmul — the
    products are exact either way (bf16 is a subset of f32) and both arms
    accumulate in f32, so fwd AND bwd must agree to bf16 output rounding
    (the accumulation tree may differ → one-ULP flips on a handful of
    elements; measured 1/17k elements at 1 ULP)."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), lq=67, lkv=71, d=32)
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    kw = dict(causal=True, prefix_len=5, scale=32 ** -0.5, interpret=True)
    with jax.default_matmul_precision("highest"):
        base = _pallas_attention(q, k, v, None, **kw)
        native = _pallas_attention(q, k, v, None, native_score_dot=True, **kw)
        np.testing.assert_allclose(np.asarray(base, np.float32),
                                   np.asarray(native, np.float32),
                                   atol=1e-3, rtol=1e-2)
        g = jax.random.normal(jax.random.PRNGKey(8), base.shape,
                              jnp.float32).astype(jnp.bfloat16)
        base_grads = _pallas_attention_bwd(q, k, v, None, g, **kw)
        native_grads = _pallas_attention_bwd(q, k, v, None, g,
                                             native_score_dot=True, **kw)
        for a, b in zip(base_grads, native_grads):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=1e-3, rtol=1e-2)


def test_pallas_softmax_native_close_and_bwd_consistent():
    """softmax_native keeps scores/exp/probs in bf16 inside the kernel
    (f32 row normalizer). Values must track the f32-softmax path to
    bf16-rounding accuracy, fwd and bwd, and padded/masked columns must
    still contribute exact zeros."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(11), lq=67, lkv=71, d=32)
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    kvm = (jnp.arange(71)[None, :] < 59).repeat(q.shape[0], axis=0)
    kw = dict(causal=True, prefix_len=5, scale=32 ** -0.5, interpret=True)
    with jax.default_matmul_precision("highest"):
        base = _pallas_attention(q, k, v, kvm, **kw)
        native = _pallas_attention(q, k, v, kvm, softmax_native=True, **kw)
        np.testing.assert_allclose(np.asarray(base, np.float32),
                                   np.asarray(native, np.float32),
                                   atol=2e-2, rtol=2e-2)
        g = jax.random.normal(jax.random.PRNGKey(12), base.shape,
                              jnp.float32).astype(jnp.bfloat16)
        base_grads = _pallas_attention_bwd(q, k, v, kvm, g, **kw)
        native_grads = _pallas_attention_bwd(q, k, v, kvm, g,
                                             softmax_native=True, **kw)
        for a, b in zip(base_grads, native_grads):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=3e-2, rtol=3e-2)
    # f32 inputs: the flag must demote to a no-op (bitwise-equal outputs).
    qf, kf, vf = _rand_qkv(jax.random.PRNGKey(13), lq=16, lkv=24, d=16)
    kwf = dict(causal=False, prefix_len=0, scale=16 ** -0.5, interpret=True)
    a = _pallas_attention(qf, kf, vf, None, **kwf)
    b = _pallas_attention(qf, kf, vf, None, softmax_native=True, **kwf)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mha_gradients_flow():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), lq=8, lkv=8, d=16)

    def loss(q, k, v):
        out = multi_head_attention(q, k, v, causal=True, use_pallas=False)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert jnp.all(jnp.isfinite(g))
        assert float(jnp.abs(g).max()) > 0


def test_attention_dropout_changes_output():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), lq=8, lkv=8, d=16)
    out_det = multi_head_attention(q, k, v, use_pallas=False)
    out_drop = multi_head_attention(q, k, v, dropout_rate=0.5,
                                    dropout_rng=jax.random.PRNGKey(0),
                                    use_pallas=False)
    assert not np.allclose(np.asarray(out_det), np.asarray(out_drop))


def test_clip_preprocess_shapes_and_stats():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(6, 360, 480, 3), dtype=np.uint8)
    out = clip_preprocess(jnp.asarray(frames))
    assert out.shape == (6, 224, 224, 3)
    # A mid-gray image should normalize to ((0.5 - mean) / std)
    gray = np.full((1, 224, 224, 3), 128, np.uint8)
    got = np.asarray(clip_preprocess(jnp.asarray(gray)))[0, 0, 0]
    want = (128 / 255 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_clip_preprocess_matches_torchvision():
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    from PIL import Image
    from torchvision.transforms import (CenterCrop, Compose, Normalize,
                                        Resize, ToTensor)

    rng = np.random.default_rng(1)
    # smooth image (random low-freq) so PIL-vs-jax bicubic edge diffs stay small
    small = rng.random((12, 16, 3)).astype(np.float32)
    big = np.array(Image.fromarray(
        (small * 255).astype(np.uint8)).resize((480, 360), Image.BILINEAR))
    frame_bgr = big[..., ::-1].copy()  # pipeline input is BGR

    trans = Compose([
        ToTensor(),
        Resize(224, interpolation=Image.BICUBIC),
        CenterCrop(224),
        Normalize(CLIP_MEAN, CLIP_STD),
    ])
    # reference applies BGR->RGB flip between crop and normalize
    t = ToTensor()(frame_bgr)
    t = Resize(224, interpolation=Image.BICUBIC)(t)
    t = CenterCrop(224)(t)
    t = t[[2, 1, 0], ...]
    ref = Normalize(CLIP_MEAN, CLIP_STD)(t).numpy().transpose(1, 2, 0)

    got = np.asarray(clip_preprocess(jnp.asarray(frame_bgr[None])))[0]
    assert np.abs(got - ref).mean() < 0.05


def test_fused_layernorm_matches_flax():
    import flax.linen as nn
    from rtvc_tpu.ops.layernorm import _pallas_ln, _ln_reference

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(37, 100)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(100,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(100,)).astype(np.float32))
    ref = _ln_reference(x, scale, bias, 1e-5)
    flax_ln = nn.LayerNorm(epsilon=1e-5)
    flax_out = flax_ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(flax_out),
                               atol=2e-5, rtol=2e-5)
    got = _pallas_ln(x, scale, bias, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_layernorm_gradients_match():
    from rtvc_tpu.ops.layernorm import _ln_reference, fused_layer_norm

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    # closed-form bwd vs autodiff-of-reference
    def ref_loss(x, s, b):
        return jnp.sum(_ln_reference(x, s, b, 1e-5) ** 2)

    gx_ref, gs_ref, gb_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, scale, bias)

    from rtvc_tpu.ops.layernorm import _fused_ln_bwd
    y = _ln_reference(x, scale, bias, 1e-5)
    g = 2 * y
    gx, gs, gb = _fused_ln_bwd(1e-5, (x, scale), g)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               atol=1e-4, rtol=1e-4)


def _fused_ln_fwd_interp(x, s, b):
    from rtvc_tpu.ops.layernorm import _pallas_ln
    return _pallas_ln(x, s, b, 1e-5, interpret=True), (x, s)


def test_int8_quantization_roundtrip():
    from rtvc_tpu.ops.quantization import (int8_matmul, quantize_activations,
                                           quantize_weight)

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(7, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    w_q, w_s = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and w_s.shape == (32,)
    # dequantized weight close to original
    np.testing.assert_allclose(np.asarray(w_q.astype(jnp.float32) * w_s),
                               np.asarray(w), atol=np.abs(w).max() / 100)
    got = int8_matmul(x, w_q, w_s, b)
    want = x @ w + b
    rel = np.abs(np.asarray(got) - np.asarray(want)).max() / np.abs(want).max()
    assert rel < 0.03  # W8A8 dynamic keeps ~2 decimal digits


def test_quantized_teacher_close_to_float():
    from rtvc_tpu.models.git_teacher import (GITTeacher,
                                             quantize_teacher_variables)
    from test_models import TINY_GIT
    import dataclasses

    frames = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 7, 9]], jnp.int32)
    float_model = GITTeacher(TINY_GIT)
    fvars = float_model.init(jax.random.PRNGKey(0), frames, caps)
    f_logits = float_model.apply(fvars, frames, caps)

    q_cfg = dataclasses.replace(
        TINY_GIT, quantized=True,
        clip=dataclasses.replace(TINY_GIT.clip, quantized=True))
    q_model = GITTeacher(q_cfg)
    qvars = quantize_teacher_variables(fvars)
    # param tree structurally matches the quantized model's expectations
    ref_shapes = jax.tree.map(lambda a: a.shape,
                              q_model.init(jax.random.PRNGKey(1), frames,
                                           caps)["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, qvars["params"])
    assert ref_shapes == got_shapes
    q_logits = q_model.apply(qvars, frames, caps)
    # KD-quality check: probabilities stay close through 2+24 quantized layers
    pf = jax.nn.softmax(f_logits.astype(jnp.float32), -1)
    pq = jax.nn.softmax(q_logits.astype(jnp.float32), -1)
    tv = float(jnp.abs(pf - pq).sum(-1).max()) / 2  # total variation
    assert tv < 0.15, tv
    # argmax agreement on most positions
    agree = float(jnp.mean(jnp.argmax(f_logits, -1) == jnp.argmax(q_logits, -1)))
    assert agree >= 0.75, agree


# ---------------------------------------------------------------------------
# Pallas backward kernel + in-kernel dropout (interpret mode)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal,prefix,lq,lkv", [
    (True, 0, 40, 45),      # student decoder self-attention shape class
    (True, 30, 62, 62),     # teacher joint prefix-causal (scaled down)
    (False, 0, 130, 140),   # cross / bidirectional with partial q block
])
def test_pallas_bwd_matches_xla_vjp(causal, prefix, lq, lkv):
    """Grad parity: the pallas backward kernel == XLA's VJP of the same
    masked-softmax attention (VERDICT round-1 item #9)."""
    from rtvc_tpu.ops.attention import _pallas_attention_bwd

    q, k, v = _rand_qkv(jax.random.PRNGKey(4), lq=lq, lkv=lkv, d=24)
    kv_mask = jnp.arange(lkv)[None, :] < jnp.array([[lkv], [lkv - 9]])
    scale = 24 ** -0.5

    with jax.default_matmul_precision("highest"):
        def f(q, k, v):
            return xla_attention(q, k, v, causal=causal, prefix_len=prefix,
                                 kv_mask=kv_mask, scale=scale)

        out, vjp = jax.vjp(f, q, k, v)
        g = jax.random.normal(jax.random.PRNGKey(5), out.shape, out.dtype)
        want_dq, want_dk, want_dv = vjp(g)
        got_dq, got_dk, got_dv = _pallas_attention_bwd(
            q, k, v, kv_mask, g, causal=causal, prefix_len=prefix,
            scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got_dq), np.asarray(want_dq),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got_dk), np.asarray(want_dk),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv),
                               atol=3e-5, rtol=3e-5)


def test_pallas_dropout_deterministic_and_scaled():
    """Same seed -> identical output; mask respects the keep-probability
    scale (kept entries match the no-dropout probs / (1-rate) structure)."""
    from rtvc_tpu.ops.attention import _pallas_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(6), lq=32, lkv=48, d=16)
    seed = jnp.asarray([1234], jnp.int32)
    kwargs = dict(causal=False, prefix_len=0, scale=16 ** -0.5,
                  dropout_rate=0.4, seed=seed, interpret=True)
    o1 = _pallas_attention(q, k, v, None, **kwargs)
    o2 = _pallas_attention(q, k, v, None, **kwargs)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = _pallas_attention(q, k, v, None, causal=False, prefix_len=0,
                           scale=16 ** -0.5, dropout_rate=0.4,
                           seed=jnp.asarray([99], jnp.int32), interpret=True)
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-4


def test_pallas_dropout_rate_statistics():
    """With uniform V = identity-ish rows, the fraction of dropped prob mass
    matches the rate (loose bound, large sample)."""
    from rtvc_tpu.ops.attention import _pallas_attention

    b, h, l, d = 2, 2, 64, 16
    q = jnp.zeros((b, h, l, d))
    k = jnp.zeros((b, h, l, d))
    v = jnp.ones((b, h, l, d))
    # uniform probs 1/l each; dropout keeps ~ (1-rate) of columns, each
    # scaled by 1/(1-rate) -> E[out] = 1, per-row variance ~ rate/(l-ish)
    rate = 0.3
    out = _pallas_attention(q, k, v, None, causal=False, prefix_len=0,
                            scale=1.0, dropout_rate=rate,
                            seed=jnp.asarray([7], jnp.int32), interpret=True)
    mean = float(jnp.mean(out))
    assert abs(mean - 1.0) < 0.05, mean
    # kept-column count per row ~ Binomial(l, 1-rate): check global fraction
    probs_kept = float(jnp.mean(out > 0))
    assert probs_kept > 0.9  # rows average many kept columns


def test_pallas_dropout_bwd_is_vjp_of_fwd():
    """The backward kernel with dropout is the true VJP of the forward with
    the SAME regenerated mask: directional finite differences agree."""
    from rtvc_tpu.ops.attention import (_pallas_attention,
                                        _pallas_attention_bwd)

    q, k, v = _rand_qkv(jax.random.PRNGKey(8), b=1, h=2, lq=24, lkv=24, d=8)
    q64, k64, v64 = (x.astype(jnp.float32) for x in (q, k, v))
    seed = jnp.asarray([42], jnp.int32)
    rate, scale = 0.25, 8 ** -0.5

    def f(q_, k_, v_):
        return _pallas_attention(q_, k_, v_, None, causal=True, prefix_len=0,
                                 scale=scale, dropout_rate=rate, seed=seed,
                                 interpret=True)

    with jax.default_matmul_precision("highest"):
        out = f(q64, k64, v64)
        g = jax.random.normal(jax.random.PRNGKey(9), out.shape)
        dq, dk, dv = _pallas_attention_bwd(
            q64, k64, v64, None, g, causal=True, prefix_len=0, scale=scale,
            dropout_rate=rate, seed=seed, interpret=True)
        eps = 1e-3
        rngs = jax.random.split(jax.random.PRNGKey(10), 3)
        for x, dx, name, i in ((q64, dq, "dq", 0), (k64, dk, "dk", 1),
                               (v64, dv, "dv", 2)):
            u = jax.random.normal(rngs[i], x.shape)
            args = [q64, k64, v64]
            args_p = list(args); args_p[i] = x + eps * u
            args_m = list(args); args_m[i] = x - eps * u
            fd = float(jnp.sum((f(*args_p) - f(*args_m)).astype(jnp.float32)
                               * g) / (2 * eps))
            an = float(jnp.sum(dx * u))
            assert abs(fd - an) < 3e-2 * max(1.0, abs(an)), (name, fd, an)


def test_flash_attention_grad_path():
    """flash_attention end-to-end under jax.grad (interpret on CPU), with
    and without dropout."""
    from rtvc_tpu.ops.attention import flash_attention

    q, k, v = _rand_qkv(jax.random.PRNGKey(11), b=1, h=2, lq=16, lkv=16, d=8)

    def loss(q, k, v):
        out = flash_attention(q, k, v, causal=True)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert jnp.all(jnp.isfinite(g)) and float(jnp.abs(g).max()) > 0

    def loss_drop(q, k, v):
        out = flash_attention(q, k, v, causal=True, dropout_rate=0.2,
                              dropout_rng=jax.random.PRNGKey(12))
        return jnp.sum(out ** 2)

    grads = jax.grad(loss_drop, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert jnp.all(jnp.isfinite(g)) and float(jnp.abs(g).max()) > 0


def test_fused_add_layer_norm_parity():
    """Pallas (interpret) add+LN == reference (x + d -> LN) for both
    outputs, plus gradient parity through the custom VJP."""
    from rtvc_tpu.ops.layernorm import (_ln_reference, _pallas_add_ln,
                                        fused_add_layer_norm)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(37, 96)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(37, 96)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(96,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(96,)), jnp.float32)

    y_p, h_p = _pallas_add_ln(x, d, scale, bias, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(x + d),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h_p), np.asarray(_ln_reference(x + d, scale, bias, 1e-5)),
        atol=1e-5, rtol=1e-5)

    # grads through the XLA fallback path (production CPU route)
    def loss(x, d, scale, bias):
        y, h = fused_add_layer_norm(x, d, scale, bias, use_pallas=False)
        return jnp.sum(y * h)

    def loss_ref(x, d, scale, bias):
        y = x + d
        return jnp.sum(y * _ln_reference(y, scale, bias, 1e-5))

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(x, d, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, d, scale, bias)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_blhd_attention_matches_xla():
    """The layout-native [B, L, H, D] kernel == XLA attention on the same
    (transposed) inputs (bidirectional/maskless — the CLIP tower case)."""
    from rtvc_tpu.ops.attention import blhd_attention

    rng = np.random.default_rng(0)
    b, l, h, d = 3, 57, 4, 24
    q = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = blhd_attention(q, k, v, interpret=True)
        want = xla_attention(*(jnp.transpose(t, (0, 2, 1, 3))
                               for t in (q, k, v)))
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.transpose(want, (0, 2, 1, 3))),
                               atol=2e-5, rtol=2e-5)


def test_window_attention_matches_xla():
    """The window kernel (in-kernel learned bias; recorded experiment,
    USE_WINDOW_PALLAS — docs/PERF.md §1b round-4 addendum) == XLA
    attention with the same [H, N, N] bias, in both softmax dtype modes,
    including an awkward window-batch (b=7 forces the C=1 block path)."""
    from rtvc_tpu.ops.attention import window_attention

    rng = np.random.default_rng(0)
    for b, h, n, d in ((12, 3, 49, 32), (7, 2, 50, 16)):
        q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
        for native in (False, True):
            with jax.default_matmul_precision("highest"):
                got = window_attention(q, k, v, bias, scale=d ** -0.5,
                                       softmax_in_input_dtype=native,
                                       interpret=True)
                want = xla_attention(q, k, v, bias=bias[None],
                                     scale=d ** -0.5,
                                     softmax_in_input_dtype=native)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=2e-5)


def test_window_attention_grads_match_xla():
    """The explicit-formula custom VJP (incl. dbias — the bias is a
    LEARNED parameter) == autodiff through the XLA path."""
    from rtvc_tpu.ops.attention import window_attention

    rng = np.random.default_rng(1)
    b, h, n, d = 6, 3, 21, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)

    def f_new(q, k, v, bias):
        return jnp.sum(jnp.sin(window_attention(
            q, k, v, bias, scale=d ** -0.5, interpret=True)))

    def f_ref(q, k, v, bias):
        return jnp.sum(jnp.sin(xla_attention(
            q, k, v, bias=bias[None], scale=d ** -0.5)))

    with jax.default_matmul_precision("highest"):
        g_new = jax.grad(f_new, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-4)
