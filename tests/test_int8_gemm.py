"""Pallas W8A8 GEMM (ops/int8_gemm.py) vs the XLA int8 reference path.

The kernel must be numerically IDENTICAL to ops.quantization.int8_matmul
(same int8 operands -> int32 accumulate -> f32 rescale + bias), so every
test pins equality against that reference, including the padding wrapper
and the QuantDense USE_PALLAS_INT8 routing. Runs in interpret mode on the
CPU test backend — same kernel code the TPU executes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu.ops import int8_gemm, quantization


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


@pytest.mark.parametrize("bias", [True, False])
def test_w8a8_matmul_matches_xla_reference(bias):
    rng = np.random.default_rng(0)
    m, k, n = 16, 32, 24  # m, n NOT tile multiples -> exercises padding
    x = _rand(rng, (m, k))
    w = _rand(rng, (k, n))
    b = _rand(rng, (n,)) if bias else None
    wq, sw = quantization.quantize_weight(w)
    xq, sx = quantization.quantize_activations(x)

    got = int8_gemm.w8a8_matmul(xq, sx, wq, sw, bias=b,
                                out_dtype=jnp.float32, tm=8, tn=8,
                                interpret=True)
    ref = quantization.int8_matmul(x, wq, sw, b, out_dtype=jnp.float32)
    assert got.shape == (m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_w8a8_dense_3d_activations():
    rng = np.random.default_rng(1)
    b, t, k, n = 2, 9, 16, 24
    x = _rand(rng, (b, t, k))
    w = _rand(rng, (k, n))
    bias = _rand(rng, (n,))
    wq, sw = quantization.quantize_weight(w)

    got = int8_gemm.w8a8_dense(x, wq, sw, bias=bias,
                               out_dtype=jnp.float32, tm=8, tn=8)
    ref = quantization.int8_matmul(x, wq, sw, bias, out_dtype=jnp.float32)
    assert got.shape == (b, t, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_quant_dense_pallas_flag_routes_and_matches():
    """QuantDense under USE_PALLAS_INT8 == QuantDense via XLA, bitwise-ish:
    the whole cfg.tpu.quantize_teacher surface switches on this one flag."""
    rng = np.random.default_rng(2)
    x = _rand(rng, (3, 8, 16))
    layer = quantization.QuantDense(features=24)
    variables = layer.init(jax.random.PRNGKey(0), x)

    ref = layer.apply(variables, x)
    quantization.set_pallas_int8(True)
    try:
        got = layer.apply(variables, x)
    finally:
        quantization.set_pallas_int8(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_w8a8_matmul_out_dtype_bf16():
    rng = np.random.default_rng(3)
    x = _rand(rng, (8, 16))
    w = _rand(rng, (16, 8))
    wq, sw = quantization.quantize_weight(w)
    xq, sx = quantization.quantize_activations(x)
    got = int8_gemm.w8a8_matmul(xq, sx, wq, sw, out_dtype=jnp.bfloat16,
                                tm=8, tn=8, interpret=True)
    ref = quantization.int8_matmul(x, wq, sw, out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# Weight-only int8 (w8_matmul / w8_dense): the decode vocab-projection lever
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bias", [True, False])
def test_w8_matmul_matches_float_reference(bias):
    """The weight-only kernel must equal the SAME math staged in XLA:
    (x . wq_f32) * sw + b. Odd m/n exercise the pad-to-8 / pad-to-tn
    wrappers; interpret mode runs the identical kernel code on CPU."""
    rng = np.random.default_rng(7)
    m, k, n = 5, 32, 200  # m not a multiple of 8, n not of tn
    x = _rand(rng, (m, k))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    sw = jnp.asarray(np.abs(rng.normal(size=(n,))) + 0.1, jnp.float32)
    b = _rand(rng, (n,)) if bias else None

    got = int8_gemm.w8_matmul(x, wq, sw, bias=b, out_dtype=jnp.float32,
                              tn=128, interpret=True)
    ref = jnp.dot(x, wq.astype(jnp.float32)) * sw[None, :]
    if bias:
        ref = ref + b[None, :]
    assert got.shape == (m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_w8_dense_lead_dims():
    rng = np.random.default_rng(8)
    bsz, t, k, n = 3, 4, 16, 130
    x = _rand(rng, (bsz, t, k))
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    sw = jnp.asarray(np.abs(rng.normal(size=(n,))) + 0.1, jnp.float32)
    got = int8_gemm.w8_dense(x, wq, sw, out_dtype=jnp.float32, tn=128)
    ref = jnp.dot(x, wq.astype(jnp.float32)) * sw
    assert got.shape == (bsz, t, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def _crafted_vocab_student():
    """Tiny student whose vocab kernel is EXACTLY int8-representable
    (per-column amax forced to 127, power-of-two scale), so
    quantize_vocab_head round-trips bit-exactly and the w8 decode path
    must produce the same tokens as the float path."""
    from test_models import tiny_student

    model = tiny_student(dropout=0.0)
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64, 3))
    y = jnp.array([[101, 5, 6, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames[:1], y)

    rng = np.random.default_rng(9)
    vk = variables["params"]["linear"]["kernel"]
    q = rng.integers(-127, 128, size=vk.shape)
    q[0, :] = 127  # per-column amax -> scale = 127 * 2**-7 / 127 = 2**-7
    import flax
    variables = flax.core.unfreeze(variables)
    variables["params"]["linear"]["kernel"] = jnp.asarray(
        q.astype(np.float32) * 2.0 ** -7)
    return model, variables, frames, q


def test_quantize_vocab_head_roundtrip_exact():
    model, variables, frames, q = _crafted_vocab_student()
    pack = quantization.quantize_vocab_head(variables)
    v = q.shape[1]
    # pre-padded to the kernel lane tile (docstring: the pad must happen
    # once here, NOT per decode step inside the while_loop)
    assert pack["wq"].shape[1] % 1024 == 0
    np.testing.assert_array_equal(np.asarray(pack["wq"][:, :v], np.int64), q)
    np.testing.assert_allclose(np.asarray(pack["sw"][0, :v]), 2.0 ** -7,
                               rtol=0)
    np.testing.assert_array_equal(
        np.asarray(pack["bias"][0, :v]),
        np.asarray(variables["params"]["linear"]["bias"], np.float32))
    # pad columns can never win an argmax/top-k
    assert np.all(np.asarray(pack["bias"][0, v:]) <= -1e8)


def test_greedy_and_beam_vocab_w8_token_exact():
    """With an exactly-representable vocab kernel, the w8 decode path must
    reproduce the float path's tokens (greedy) and sequences (beam)."""
    from rtvc_tpu import decode

    model, variables, frames, _ = _crafted_vocab_student()
    pack = quantization.quantize_vocab_head(variables)

    ref = np.asarray(decode.student_greedy(model, variables, frames,
                                           max_len=6))
    got = np.asarray(decode.student_greedy(model, variables, frames,
                                           max_len=6, vocab_w8=pack))
    np.testing.assert_array_equal(got, ref)

    ref_b = np.asarray(decode.student_beam(model, variables, frames,
                                           max_len=5, k=3))
    got_b = np.asarray(decode.student_beam(model, variables, frames,
                                           max_len=5, k=3, vocab_w8=pack))
    np.testing.assert_array_equal(got_b, ref_b)


def test_make_caption_step_vocab_int8():
    """Serving knob: with_vocab_w8 + vocab_int8 produces the float tokens
    on the crafted-exact model; without the pack it raises."""
    from rtvc_tpu import serving

    model, variables, frames, _ = _crafted_vocab_student()
    u8 = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, size=(2, 3, 64, 64, 3)),
        jnp.uint8)

    base = serving.make_caption_step(model, max_len=5, crop_size=64)
    ref = np.asarray(base(variables, u8))

    step = serving.make_caption_step(model, max_len=5, crop_size=64,
                                     vocab_int8=True)
    with pytest.raises(ValueError, match="with_vocab_w8"):
        step(variables, u8)
    got = np.asarray(step(serving.with_vocab_w8(variables), u8))
    np.testing.assert_array_equal(got, ref)
