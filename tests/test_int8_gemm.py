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
