"""Stride-1 depthwise 3x3 conv with a one-pass weight-gradient kernel.

VERDICT r4 #5 / docs/PERF.md §1d: stage0's backward runs at 4.2x its
forward, attributed to XLA's depthwise-conv wgrad lowering (the known-bad
TPU path; the tap-unrolled FORWARD already lost 3.8x to lax conv in §1b,
but the backward anomaly is the *weight* gradient, a different program).
TinyViT is full of stride-1 depthwise 3x3s: MBConv conv2 (2x @56x384 in
stage0) and every attention block's local_conv (@28x192, @14x384, @7x576)
— reference model.py:114-133 / timm tiny_vit.

The math: for SAME-padded stride-1 depthwise conv,

    wgrad[ki, kj, c] = sum_{n,h,w} xpad[n, h+ki, w+kj, c] * dy[n, h, w, c]

i.e. nine elementwise multiply-reduces over shifted views of the SAME two
arrays. XLA materializes this as a batch-grouped convolution; the one-pass
formulation reads x and dy ONCE and accumulates all nine taps per block —
HBM traffic drops from O(9 * (|x|+|dy|)) to O(|x|+|dy|), and the whole
wgrad is VPU work (no MXU contention with the dgrad).

Two implementations behind :func:`dw3x3_wgrad`:
- Pallas kernel (TPU): grid over the batch dim, [1, H+2, W+2, C] x-block +
  [1, H, W, C] dy-block in VMEM, nine static slices multiply-reduced into
  a revisited [9, C] f32 accumulator.
- XLA fallback (CPU/tests): nine einsums over the padded array — same
  math, lets XLA fuse what it can.

:func:`depthwise_conv3x3` wraps forward (lax conv — §1b's winner) +
custom VJP (dgrad = SAME-padded depthwise conv with the spatially flipped
kernel; wgrad = the one-pass kernel). ``USE_DW_WGRAD_PALLAS`` switches the
models' ConvBN onto this path; A/B: scripts/ab_dw_wgrad.py, verdict in
docs/PERF.md §1f.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Route TinyViT's stride-1 depthwise 3x3s through the custom-VJP op.
# Module-level switch like attention.USE_WINDOW_PALLAS — flip before
# tracing. Off-TPU the wgrad uses the XLA one-pass fallback.
USE_DW_WGRAD_PALLAS = False


def set_dw_wgrad_pallas(value: bool) -> None:
    global USE_DW_WGRAD_PALLAS
    USE_DW_WGRAD_PALLAS = bool(value)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _wgrad_kernel(xpad_ref, dy_ref, out_ref):
    """One (batch element, channel block): accumulate 9 taps into [9, cb].

    The f32 shift-product for ONE tap at ONE channel block is the largest
    live temporary (~[H, W, cb] f32); with cb=128 that is ~1.6 MB at
    stage0's 56x56, safely inside the 16 MB scoped-VMEM stack (full-C
    blocks OOM'd: 9 x [56, 56, 384] f32 products = 30.8 MB scoped).
    """
    n = pl.program_id(1)
    xpad = xpad_ref[0]          # [H+2, W+2, cb]
    dy = dy_ref[0].astype(jnp.float32)   # [H, W, cb]
    h, w, _ = dy.shape
    taps = []
    for ki in range(3):
        for kj in range(3):
            xs = xpad[ki:ki + h, kj:kj + w, :].astype(jnp.float32)
            taps.append(jnp.sum(xs * dy, axis=(0, 1)))   # [cb]
    acc = jnp.stack(taps)       # [9, cb]

    @pl.when(n == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(n > 0)
    def _acc():
        out_ref[:] = out_ref[:] + acc


def dw3x3_wgrad_pallas(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] x, dy -> [3, 3, 1, C] f32 weight grad (SAME, stride 1)."""
    n, h, w, c = x.shape
    cb = min(c, 128)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        _wgrad_kernel,
        # channel blocks outer so the [9, cb] accumulator stays resident
        # across the inner batch sweep (out index ignores the batch id)
        grid=(pl.cdiv(c, cb), n),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cb), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cb), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cb), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h * w * c,
            bytes_accessed=(xpad.size + dy.size) * x.dtype.itemsize + 9 * c * 4,
            transcendentals=0),
        interpret=not _on_tpu(),
    )(xpad, dy)
    return out.reshape(3, 3, 1, c)


def dw3x3_wgrad_xla(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Same one-pass math via nine einsums (CPU/tests fallback)."""
    _, h, w, c = x.shape
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    taps = [jnp.einsum("nhwc,nhwc->c", xpad[:, ki:ki + h, kj:kj + w, :], dyf)
            for ki in range(3) for kj in range(3)]
    return jnp.stack(taps).reshape(3, 3, 1, c)


def dw3x3_wgrad(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    if USE_DW_WGRAD_PALLAS and _on_tpu():
        return dw3x3_wgrad_pallas(x, dy)
    return dw3x3_wgrad_xla(x, dy)


_DN = ("NHWC", "HWIO", "NHWC")


def _dw_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=_DN,
        feature_group_count=c)


@jax.custom_vjp
def depthwise_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME-padded stride-1 depthwise conv, kernel [3, 3, 1, C] (HWIO).

    Forward = lax conv (docs/PERF.md §1b: beats tap-unrolling 3.8x).
    Backward: dgrad = depthwise conv of dy with the spatially flipped
    kernel (still lax conv); wgrad = the one-pass nine-tap reduction.
    """
    return _dw_conv(x, kernel)


def _dw_fwd(x, kernel):
    return _dw_conv(x, kernel), (x, kernel)


def _dw_bwd(res, dy):
    x, kernel = res
    kflip = kernel[::-1, ::-1]
    dx = _dw_conv(dy, kflip).astype(x.dtype)
    dw = dw3x3_wgrad(x, dy).astype(kernel.dtype)
    return dx, dw


depthwise_conv3x3.defvjp(_dw_fwd, _dw_bwd)
