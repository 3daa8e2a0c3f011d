"""Fused LayerNorm Pallas kernel.

Profiling the GIT teacher forward on v5e showed XLA's LayerNorm lowering
(convert → reduce fusion → normalize, with f32 upcasts) costing ~0.8 ms per
LN at [12336, 1024] — ~39 ms of a 128 ms encode across the 50 norms. This
kernel does the whole thing in one VMEM pass per row-block: f32 mean/var on
the VPU, normalize, scale+bias, cast back — ~50 MB of HBM traffic instead
of several fused passes.

Backward is a closed-form XLA VJP (exact, fuses fine — the backward pass is
not the bottleneck, and only the student's norms ever need gradients).

Used by ``FusedLayerNorm`` (drop-in for ``flax.linen.LayerNorm``: same
param names 'scale'/'bias', same epsilon semantics) on TPU; XLA everywhere
else.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_reference(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _pallas_ln(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float, block_rows: int = 256,
               interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, width = x.shape
    rows_p = _round_up(max(rows, 8), block_rows)
    width_p = _round_up(width, 128)
    if rows_p != rows or width_p != width:
        x = jnp.pad(x, ((0, rows_p - rows), (0, width_p - width)))
        scale = jnp.pad(scale, (0, width_p - width))
        bias = jnp.pad(bias, (0, width_p - width))

    inv_n = 1.0 / width  # true width, not padded

    def kernel(x_ref, s_ref, b_ref, o_ref):
        xv = x_ref[...].astype(jnp.float32)            # [block, Wp]
        if width_p != width:
            col = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
            xv = jnp.where(col < width, xv, 0.0)
        mean = jnp.sum(xv, axis=-1, keepdims=True) * inv_n
        cent = xv - mean
        if width_p != width:
            col = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
            cent = jnp.where(col < width, cent, 0.0)
        var = jnp.sum(cent * cent, axis=-1, keepdims=True) * inv_n
        y = cent * jax.lax.rsqrt(var + eps)
        y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(rows_p // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, width_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, width_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, width_p), x.dtype),
        interpret=interpret,
    )(x, scale[None], bias[None])
    return out[:rows, :width]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_ln(x, scale, bias, eps):
    return _pallas_ln(x, scale, bias, eps)


def _fused_ln_fwd(x, scale, bias, eps):
    return _pallas_ln(x, scale, bias, eps), (x, scale)


def _fused_ln_bwd(eps, res, g):
    x, scale = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    n = x.shape[-1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cent = x32 - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = cent * rstd
    gy = g32 * scale.astype(jnp.float32)
    dx = rstd * (gy - jnp.mean(gy, axis=-1, keepdims=True)
                 - xhat * jnp.mean(gy * xhat, axis=-1, keepdims=True))
    dscale = jnp.sum(g32 * xhat, axis=0)
    dbias = jnp.sum(g32, axis=0)
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


# A/B on v5e (GIT teacher fwd, B8): standalone Pallas LN makes LN ops
# themselves ~30x cheaper in the op profile, but the WHOLE program is ~6%
# slower (128.4 vs 121.6 ms p50) because XLA can no longer fuse the norm
# into neighboring residual adds / matmul epilogues. Default is therefore
# XLA; flip ENABLE_PALLAS_LN for kernels that later fuse the residual too.
ENABLE_PALLAS_LN = False


def fused_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-5,
                     use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """LayerNorm over the last axis; XLA by default (see A/B note above)."""
    if use_pallas is None:
        if not ENABLE_PALLAS_LN:
            use_pallas = False
        else:
            try:
                use_pallas = jax.devices()[0].platform == "tpu"
            except Exception:
                use_pallas = False
    shape = x.shape
    width = shape[-1]
    if not use_pallas:
        return _ln_reference(x, scale, bias, eps)
    flat = x.reshape(-1, width)
    out = _fused_ln(flat, scale, bias, eps)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Residual-add + LayerNorm fused kernel (ROADMAP #6)
# ---------------------------------------------------------------------------
# The standalone LN kernel above lost in context because XLA fuses a lone
# LN into neighboring ops. The (x + delta -> LN) pair is different: XLA
# materializes the sum AND runs the multi-pass norm (~0.37 ms per site at
# [12336, 1024], scripts/profile_ops.py); one kernel pass can emit both the
# sum (needed by the next residual) and the normed value.

def _pallas_add_ln(x, delta, scale, bias, eps, block_rows: int = 256,
                   interpret: bool = False):
    # block_rows 256: 2 inputs + 2 outputs + f32 compute buffers at
    # [256, 1024] stay well under the 16 MB scoped-VMEM limit (512 rows
    # OOMed at 17.46M on v5e when the caller's activations were f32)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, width = x.shape
    block_rows = min(_round_up(rows, 8), block_rows)
    inv_n = 1.0 / width

    def kernel(x_ref, d_ref, s_ref, b_ref, y_ref, h_ref):
        xv = x_ref[...].astype(jnp.float32)
        dv = d_ref[...].astype(jnp.float32)
        y = xv + dv
        y_ref[...] = y.astype(y_ref.dtype)
        mean = jnp.sum(y, axis=-1, keepdims=True) * inv_n
        cent = y - mean
        var = jnp.sum(cent * cent, axis=-1, keepdims=True) * inv_n
        h = cent * jax.lax.rsqrt(var + eps)
        h = h * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
        h_ref[...] = h.astype(h_ref.dtype)

    row_spec = pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    y, h = pl.pallas_call(
        kernel,
        grid=(-(-rows // block_rows),),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, width), x.dtype),
                   jax.ShapeDtypeStruct((rows, width), x.dtype)],
        interpret=interpret,
    )(x, delta, scale[None], bias[None])
    return y, h


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_add_ln(x, delta, scale, bias, eps, interpret):
    return _pallas_add_ln(x, delta, scale, bias, eps, interpret=interpret)


def _fused_add_ln_fwd(x, delta, scale, bias, eps, interpret):
    y, h = _pallas_add_ln(x, delta, scale, bias, eps, interpret=interpret)
    return (y, h), (y, scale)


def _fused_add_ln_bwd(eps, interpret, res, grads):
    y, scale = res
    gy, gh = grads
    # d/dy of LN(y) (same closed form as _fused_ln_bwd) plus the pass-through
    # gy; x and delta receive identical gradients.
    dy_ln = _fused_ln_bwd(eps, (y, scale), gh)
    dy = dy_ln[0].astype(jnp.float32) + gy.astype(jnp.float32)
    dy = dy.astype(y.dtype)
    return (dy, dy, dy_ln[1], dy_ln[2])


_fused_add_ln.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)


def fused_add_layer_norm(x: jnp.ndarray, delta: jnp.ndarray,
                         scale: jnp.ndarray, bias: jnp.ndarray,
                         eps: float = 1e-5,
                         use_pallas: Optional[bool] = None):
    """(y, h) = (x + delta, LayerNorm(x + delta)) in one HBM pass on TPU.

    Returns BOTH: ``y`` feeds the next residual branch, ``h`` the sublayer.
    XLA fallback elsewhere (and by default until the in-context A/B says
    the kernel wins — see ENABLE_PALLAS_ADD_LN)."""
    if use_pallas is None:
        if not ENABLE_PALLAS_ADD_LN:
            use_pallas = False
        else:
            try:
                use_pallas = jax.devices()[0].platform == "tpu"
            except Exception:
                use_pallas = False
    shape = x.shape
    width = shape[-1]
    if not use_pallas:
        y = x + delta
        return y, _ln_reference(y, scale, bias, eps)
    y, h = _fused_add_ln(x.reshape(-1, width), delta.reshape(-1, width),
                         scale, bias, eps, False)
    return y.reshape(shape), h.reshape(shape)


# A/B result (v5e, full bf16 teacher fwd B8, scripts/ab_teacher_attention.py
# --add-ln): off 122.96 / on 122.35 / off 122.18 ms — a wash. XLA already
# fuses the residual add into its LN lowering at bf16; the kernel only
# matters if a future op sequence breaks that fusion. Default stays off.
ENABLE_PALLAS_ADD_LN = False


def set_pallas_add_ln(value: bool) -> None:
    global ENABLE_PALLAS_ADD_LN
    ENABLE_PALLAS_ADD_LN = value


import flax.linen as nn


class FusedLayerNorm(nn.Module):
    """Drop-in for ``flax.linen.LayerNorm`` (same 'scale'/'bias' param names,
    so converted checkpoints load identically) backed by the Pallas kernel
    on TPU."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (width,))
        bias = self.param("bias", nn.initializers.zeros, (width,))
        return fused_layer_norm(x, scale, bias, self.epsilon)


class FusedAddLayerNorm(nn.Module):
    """Residual-add + LayerNorm as one op: ``(y, h) = (x + d, LN(x + d))``.

    Same param names as FusedLayerNorm/flax LayerNorm, so a converted
    checkpoint loads identically whether the callsite uses the plain or the
    fused module — only the call signature differs."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, delta: jnp.ndarray):
        width = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (width,))
        bias = self.param("bias", nn.initializers.zeros, (width,))
        return fused_add_layer_norm(x, delta, scale, bias, self.epsilon)
