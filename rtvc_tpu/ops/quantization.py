"""Int8 quantization for the frozen teacher (W8A8 dynamic).

The distillation teacher is inference-only (frozen at load, reference
model.py:741-745), which makes it a textbook target for int8: the v5e MXU
runs int8 x int8 → int32 at 2x the bf16 rate, and KD logits tolerate
per-channel weight + per-token dynamic activation quantization.

Measured A/B (v5e, full GIT-Large teacher fwd, B8): **accuracy holds**
(max total-variation 0.013, argmax agreement 94% on random weights) but
**no end-to-end speedup via XLA** (122.9 vs 123.0 ms p50) — this XLA build
does not appear to lower the int8 dot to the doubled-rate MXU path, and the
per-activation quantize passes add elementwise traffic. Round 5 added the
explicit Pallas route (:mod:`.int8_gemm`, ROADMAP #8): set
:data:`USE_PALLAS_INT8` (or :func:`set_pallas_int8`) and every
``QuantDense`` — i.e. the whole ``TpuConfig.quantize_teacher`` surface —
runs the int8 MXU kernel instead of the XLA dot. MEASURED VERDICT
(docs/PERF.md §1e): dead end on this toolchain — Mosaic issues the int8
dot at the bf16 rate while XLA's bf16 GEMMs already run at peak, so the
Pallas route is 0.41-0.98x per GEMM and 1.219x slower on the full train
step. Both knobs stay (default off) for runtimes whose int8 lowering is
real. A/B harnesses: scripts/ab_int8_pallas_gemm.py (raw GEMM) and
scripts/ab_int8_step.py (full train step).

Scheme (standard W8A8 dynamic):
- weights: symmetric per-OUTPUT-channel int8, scale = max|w_col| / 127,
  computed once at load by :func:`quantize_teacher_params`;
- activations: symmetric per-token (per row) int8 at runtime,
  scale = max|x_row| / 127;
- matmul: ``lax.dot_general(x_i8, w_i8, preferred_element_type=int32)``
  then rescale by sx ⊗ sw and add the fp bias.

``QuantDense`` is the drop-in module; teacher configs grow a ``quantized``
flag that swaps it in for every Dense in the textual head and CLIP blocks
(patch conv and embeddings stay bf16 — negligible FLOPs).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

PyTree = Any

# Route QuantDense through the Pallas W8A8 MXU kernel (ops/int8_gemm.py)
# instead of the XLA int8 dot. Module-level switch like
# attention.USE_WINDOW_PALLAS: flip BEFORE tracing (it is baked into the
# jitted program). Off CPU the kernel runs in interpret mode, so tests
# exercise the same code path.
USE_PALLAS_INT8 = False


def set_pallas_int8(value: bool) -> None:
    global USE_PALLAS_INT8
    USE_PALLAS_INT8 = bool(value)


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] float kernel → (int8 kernel, per-output-channel scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_vocab_head(variables: PyTree) -> PyTree:
    """One-time weight-only int8 pack of the STUDENT's vocab projection
    (param collection ``params/linear``, the 576x30522 Dense that is ~100%
    of the greedy decode loop's per-token cost — docs/PERF.md §5 round-5
    addendum). Returns ``{"wq", "sw", "bias"}`` for the ``vocab_w8``
    argument of :func:`rtvc_tpu.decode.student_greedy` /
    :func:`~rtvc_tpu.decode.student_beam` and the serving
    ``vocab_int8`` knob. Compute it ONCE per weight set outside the decode
    program — quantizing inside the jitted step would re-read the full
    float weight every window and eat the win.

    Opt-in: per-channel symmetric rounding perturbs logits at bf16-rounding
    scale (~4e-3 relative), which can flip argmax on near-ties, so the
    exact bf16 projection stays the default everywhere. MEASURED: a wash
    (0.97x) in the composed caption step on the v5e — XLA already hides
    the vocab read under decoder-layer compute (int8_gemm.w8_matmul
    docstring; scripts/ab_w8_vocab.py) — so there is currently no reason
    to take the flip risk at THIS model's shapes; the knob exists for
    wider-vocab/longer-decode variants.

    The pack is pre-padded to the kernel's lane-tile multiple (tn=1024)
    HERE: ``w8_matmul``'s pad wrapper would otherwise run inside the
    decode ``while_loop`` body, and XLA does not hoist loop-invariant ops
    out of while loops — the 17.6 MB int8 pad-copy per generated token
    measured the whole kernel win away (0.73x full-program vs 1.70x on
    the isolated GEMV). Padded bias is -1e9 so pad columns can never win
    argmax/top-k; decode_step slices logits back to vocab_size anyway.
    """
    p = variables["params"]["linear"]
    wq, sw = quantize_weight(p["kernel"])
    bias = p["bias"].astype(jnp.float32)
    tn = 1024
    pad = (-wq.shape[1]) % tn
    if pad:
        wq = jnp.pad(wq, ((0, 0), (0, pad)))
        sw = jnp.pad(sw, (0, pad))
        bias = jnp.pad(bias, (0, pad), constant_values=-1e9)
    return {"wq": wq, "sw": sw.reshape(1, -1),
            "bias": bias.reshape(1, -1)}


def quantize_activations(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., in] float → (int8, per-row scale [..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """W8A8 dynamic matmul: quantize x per-token, int8 MXU dot, rescale.

    With :data:`USE_PALLAS_INT8` set, the dot+rescale+bias runs as the
    explicit Pallas MXU kernel (:func:`.int8_gemm.w8a8_dense`) — same
    quantization scheme, same operands, fused epilogue in VMEM.
    """
    if USE_PALLAS_INT8:
        from .int8_gemm import w8a8_dense
        return w8a8_dense(x, w_q, w_scale, bias=bias, out_dtype=out_dtype)
    x_q, x_scale = quantize_activations(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in Dense running W8A8 (params: kernel_q int8, kernel_scale,
    bias). Populate params via :func:`quantize_teacher_params` from a float
    checkpoint — random init is only for shape/dtype discovery."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda rng, shape: jax.random.randint(rng, shape, -5, 5, jnp.int8),
            (in_dim, self.features))
        kernel_scale = self.param(
            "kernel_scale", nn.initializers.constant(0.01),
            (self.features,))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return int8_matmul(x, kernel_q, kernel_scale, bias,
                           out_dtype=self.dtype)


def quantize_teacher_params(params: PyTree) -> PyTree:
    """Float teacher param tree → quantized tree: every 2-D ``kernel`` leaf
    becomes ``kernel_q`` + ``kernel_scale`` (biases/norms/embeddings and the
    4-D patch-conv kernel stay float).

    Pass DEVICE arrays: per-leaf jnp ops on host numpy trigger one TPU
    round-trip per leaf (~5 min for the 394M teacher vs seconds on-device).
    """
    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                w_q, scale = quantize_weight(node["kernel"])
                out = {k: walk(v) for k, v in node.items() if k != "kernel"}
                out["kernel_q"] = w_q
                out["kernel_scale"] = scale
                return out
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(dict(params))
