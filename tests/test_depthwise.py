"""Custom one-pass depthwise-3x3 wgrad (ops/depthwise.py) vs XLA autodiff.

The custom VJP must be numerically indistinguishable from differentiating
the plain lax conv: forward identical, dgrad/wgrad allclose at f32. The
Pallas kernel runs in interpret mode here (tiny shapes) — same code the
TPU executes; the model-integration test pins the ConvBN routing under
USE_DW_WGRAD_PALLAS against the flag-off reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu.ops import depthwise


def _loss_ref(x, kernel):
    y = depthwise._dw_conv(x, kernel)
    return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))


def _loss_custom(x, kernel):
    y = depthwise.depthwise_conv3x3(x, kernel)
    return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 1, 8)) * 0.3, jnp.float32)

    y_ref = depthwise._dw_conv(x, kernel)
    y_got = depthwise.depthwise_conv3x3(x, kernel)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)

    gx_ref, gk_ref = jax.grad(_loss_ref, argnums=(0, 1))(x, kernel)
    gx_got, gk_got = jax.grad(_loss_custom, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_got), np.asarray(gk_ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_wgrad_interpret_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 6, 6, 8)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(3, 6, 6, 8)), jnp.float32)
    ref = depthwise.dw3x3_wgrad_xla(x, dy)
    # force interpret explicitly via the kernel entry (not _on_tpu gating)
    got = depthwise.dw3x3_wgrad_pallas(x, dy)
    assert got.shape == (3, 3, 1, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c", [96, 192, 384])
def test_pallas_wgrad_channel_blocks(c):
    """Multi-block channel grid (cb=128): full blocks, partial tail blocks
    (192 = 128+64), and the single-partial-block case (96 < 128) must all
    match the XLA one-pass math — the VMEM-OOM fix grids C, and block
    padding must never leak into real channels."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 7, 9, c)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(2, 7, 9, c)), jnp.float32)
    ref = depthwise.dw3x3_wgrad_xla(x, dy)
    got = depthwise.dw3x3_wgrad_pallas(x, dy)
    assert got.shape == (3, 3, 1, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_convbn_flag_routing_preserves_numerics():
    """TinyViT ConvBN with USE_DW_WGRAD_PALLAS on == off: same params tree,
    same forward, same grads (CPU -> XLA one-pass wgrad fallback)."""
    from rtvc_tpu.models.tinyvit import ConvBN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    layer = ConvBN(features=16, kernel=3, stride=1, groups=16)

    variables = layer.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, use):
        depthwise.set_dw_wgrad_pallas(use)
        try:
            y, _ = layer.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        finally:
            depthwise.set_dw_wgrad_pallas(False)

    # identical param tree both ways
    depthwise.set_dw_wgrad_pallas(True)
    try:
        v2 = layer.init(jax.random.PRNGKey(0), x, train=False)
    finally:
        depthwise.set_dw_wgrad_pallas(False)
    assert jax.tree.structure(v2) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(v2), jax.tree.leaves(variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    g_off = jax.grad(loss)(variables["params"], False)
    g_on = jax.grad(loss)(variables["params"], True)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_custom_vjp_bf16_path(dtype):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), dtype)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 1, 8)) * 0.3, dtype)
    gx, gk = jax.grad(
        lambda a, k: jnp.sum(
            depthwise.depthwise_conv3x3(a, k).astype(jnp.float32) ** 2),
        argnums=(0, 1))(x, kernel)
    gx_r, gk_r = jax.grad(
        lambda a, k: jnp.sum(
            depthwise._dw_conv(a, k).astype(jnp.float32) ** 2),
        argnums=(0, 1))(x, kernel)
    assert gx.dtype == dtype and gk.dtype == dtype
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(gx_r, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(gk_r, np.float32),
                               rtol=0.05, atol=0.05)
