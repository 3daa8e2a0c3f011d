"""Pallas W8A8 GEMM for the frozen teacher (VERDICT r4 #4 / ROADMAP #8).

Why a kernel: the XLA route (``quantization.int8_matmul``) measured 1.06x
SLOWER than bf16 end-to-end — this XLA build does not lower
``dot_general(int8, int8, preferred_element_type=int32)`` onto the v5e
MXU's doubled int8 rate, and the dynamic per-token quantize adds
elementwise passes. This kernel feeds the MXU int8 tiles directly:

    y[M, N] = (x_q[M, K] . w_q[K, N]) * sx[M, 1] * sw[1, N] + b[N]

- activations are quantized OUTSIDE the kernel (``quantize_activations``)
  so XLA fuses the per-token amax/round into the producer (LayerNorm,
  GELU) and the kernel reads HALF the activation bytes (int8 vs bf16);
- weights are pre-quantized once at teacher load
  (``quantization.quantize_teacher_params``) — per-output-channel scales;
- the int32 accumulator is rescaled and biased in-kernel (f32 VPU) and
  written in the caller's dtype, so no extra HBM round-trip.

Grid: (M/TM, N/TN), K unblocked (teacher K <= 4096: the full K strip of
x and w fits VMEM at TM=256/TN=256 with room for double buffering).
Shapes are padded to tile multiples in the wrapper; the pad rows/cols
are sliced off after (<2% traffic at the teacher's M = 12336).

The teacher hot loop this serves: reference model.py:747-760 (frozen
GIT-Large forward inside every cold-cache distillation step).

MEASURED VERDICT (round 5, docs/PERF.md §1e): dead end on this
v5e + Mosaic toolchain. bf16 XLA already runs the teacher GEMMs at
163-223 TFLOP/s (~peak), and this kernel's int8 dot tops out at ~197
TFLOP/s — Mosaic does not issue the doubled-rate int8 MXU op — so every
shape loses (0.41-0.98x per GEMM; full train step 1.219x slower). The
kernel stays, interpret-parity-pinned (tests/test_int8_gemm.py), as the
ready route for toolchains whose int8 lowering is real.
Measured A/B: scripts/ab_int8_pallas_gemm.py (raw GEMM) and
scripts/ab_int8_step.py (full train step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8a8_kernel(xq_ref, sx_ref, wq_ref, sw_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
    y = y + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _w8a8_kernel_nobias(xq_ref, sx_ref, wq_ref, sw_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
                ).astype(o_ref.dtype)


def _w8_kernel(x_ref, wq_ref, sw_ref, b_ref, o_ref):
    w = wq_ref[:].astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc * sw_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _w8_kernel_nobias(x_ref, wq_ref, sw_ref, o_ref):
    w = wq_ref[:].astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc * sw_ref[:]).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    rem = (-x.shape[axis]) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "tm", "tn", "interpret"))
def w8a8_matmul(xq: jnp.ndarray, sx: jnp.ndarray, wq: jnp.ndarray,
                sw: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                out_dtype: jnp.dtype = jnp.float32,
                tm: int = 256, tn: int = 256,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """[M, K] int8 (+ per-row scale [M, 1]) x [K, N] int8 (+ per-col scale
    [N]) -> [M, N] ``out_dtype``. 2-D core; callers flatten leading dims."""
    if interpret is None:
        interpret = not _on_tpu()
    m, k = xq.shape
    n = wq.shape[1]
    xq = _pad_to(xq, 0, tm)
    sx = _pad_to(sx, 0, tm)
    wq = _pad_to(wq, 1, tn)
    sw_row = _pad_to(sw.reshape(1, -1).astype(jnp.float32), 1, tn)
    mp, np_ = xq.shape[0], wq.shape[1]

    args = [xq, sx.astype(jnp.float32), wq, sw_row]
    in_specs = [
        pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    kernel = _w8a8_kernel_nobias
    if bias is not None:
        args.append(_pad_to(bias.reshape(1, -1).astype(jnp.float32), 1, tn))
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        kernel = _w8a8_kernel

    out = pl.pallas_call(
        kernel,
        grid=(mp // tm, np_ // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k + k * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def w8a8_dense(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None,
               out_dtype: jnp.dtype = jnp.float32,
               tm: int = 256, tn: int = 256) -> jnp.ndarray:
    """Drop-in for ``quantization.int8_matmul`` running the Pallas core:
    dynamic per-token activation quantization (XLA, fuses into the
    producer) then the int8 MXU GEMM. Accepts [..., K] activations."""
    from .quantization import quantize_activations

    lead = x.shape[:-1]
    k = x.shape[-1]
    xq, sx = quantize_activations(x)
    y = w8a8_matmul(xq.reshape(-1, k), sx.reshape(-1, 1), wq, sw,
                    bias=bias, out_dtype=out_dtype, tm=tm, tn=tn)
    return y.reshape(*lead, wq.shape[1])


@functools.partial(jax.jit, static_argnames=("out_dtype", "tn", "interpret"))
def w8_matmul(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              out_dtype: jnp.dtype = jnp.float32,
              tn: int = 1024,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """WEIGHT-ONLY int8 GEMM for bandwidth-bound small-M shapes:
    y[M, N] = (x[M, K] . dequant(wq)[K, N]) * sw[1, N] + b[N], where the
    int8 weight is converted to ``x.dtype`` INSIDE VMEM — HBM sees half
    the weight bytes of the bf16 GEMM.

    Where this wins (and w8a8 does not): M is tiny (1-32 decode rows) and
    the op is a pure weight-bandwidth read — the student's 576x30522
    vocab projection inside the greedy/beam decode loop reads 35 MB bf16
    per generated token at ~roofline (51 us measured, = the entire
    50 us/token decode slope, docs/PERF.md §5). The MXU int8 rate that
    killed the W8A8 kernel (§1e) is irrelevant here; halving the bytes
    is the whole win: measured 1.70x on the ISOLATED vocab GEMV+argmax
    (48.6 -> 28.6 us). XLA's own weight-only route measures exactly
    1.00x — its dequant materializes the bf16 weight again.

    MEASURED VERDICT in the composed program (scripts/ab_w8_vocab.py,
    docs/PERF.md §5 round-5 addendum): a WASH — 0.97x on the full b=1
    and b=8 caption steps. The bf16 program's 50 us/token was never
    additive: XLA overlaps the vocab weight read with the decoder-layer
    compute of the same step, and the pallas_call boundary forfeits that
    overlap, eating exactly the bytes it saves. (First attempt measured
    0.73x — the pad wrapper ran INSIDE the while_loop, which XLA does
    not hoist; quantize_vocab_head now pre-pads. Kept, default-off, as
    the ready route for wider-vocab or longer-decode models where the
    projection outgrows what layer compute can hide.)

    x stays float ([M, K], any lead shape via :func:`w8_dense`); ``wq``
    [K, N] int8 with per-output-channel scale ``sw`` [N] (from
    ``quantization.quantize_weight``). M is padded to 8, N to ``tn``;
    K is unblocked (the full [K, tn] int8 strip lives in VMEM: 576x1024
    = 576 KB at the vocab shape, well under the 16 MB scoped limit).
    """
    if interpret is None:
        interpret = not _on_tpu()
    m, k = x.shape
    n = wq.shape[1]
    xp = _pad_to(x, 0, 8)
    wq = _pad_to(wq, 1, tn)
    sw_row = _pad_to(sw.reshape(1, -1).astype(jnp.float32), 1, tn)
    mp, np_ = xp.shape[0], wq.shape[1]

    args = [xp, wq, sw_row]
    in_specs = [
        pl.BlockSpec((mp, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    kernel = _w8_kernel_nobias
    if bias is not None:
        args.append(_pad_to(bias.reshape(1, -1).astype(jnp.float32), 1, tn))
        in_specs.append(pl.BlockSpec((1, tn), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        kernel = _w8_kernel

    out = pl.pallas_call(
        kernel,
        grid=(np_ // tn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mp, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + k * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def w8_dense(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
             bias: Optional[jnp.ndarray] = None,
             out_dtype: jnp.dtype = jnp.float32,
             tn: int = 1024) -> jnp.ndarray:
    """[..., K] float activations through :func:`w8_matmul`."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    y = w8_matmul(x.reshape(-1, k), wq, sw, bias=bias,
                  out_dtype=out_dtype, tn=tn)
    return y.reshape(*lead, wq.shape[1])
