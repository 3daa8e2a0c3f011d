"""Fused multi-head attention for TPU: Pallas kernel + XLA fallback.

This replaces the cuDNN SDPA inside the reference's
``nn.TransformerDecoderLayer`` (reference src/models/model.py:75-78) and the
BERT-style joint attention of the GIT teacher's textual head (reference
model.py:687-700 via ``TransformerDecoderTextualHead``).

Design notes (TPU-first, not a port):

- At this workload's sequence lengths (student: Lq ≤ ~45 text / 6 memory
  tokens; teacher: 1542 visual + ≤40 text ≈ 1582), the entire K/V for one
  (batch, head) fits comfortably in VMEM (1664 x 128 fp32 ≈ 0.85 MB). So the
  kernel is a *single-pass fused attention*: one grid step per
  (batch, head, q-block) computes scores = QKᵀ on the MXU, applies the mask
  in-register, softmaxes on the VPU, and multiplies by V on the MXU — no HBM
  round-trip for the [Lq, Lkv] score matrix (the thing XLA would otherwise
  materialize), and no online-softmax bookkeeping that only pays off at
  multi-thousand-token KV lengths.
- Masking is expressed positionally (prefix-causal) plus an optional
  [B, Lkv] key-validity mask, so no [L, L] mask tensor ever exists in HBM.
  ``prefix_len = P`` gives the GIT joint mask: queries/keys below P (visual
  tokens) are mutually visible; text queries (≥ P) see all visual keys and
  causally-previous text keys. ``P = 0`` is plain causal; ``causal=False``
  is full bidirectional (cross-attention).
- Shapes are padded to TPU tiles (lane = 128) inside the wrapper; padded key
  columns are masked with -inf before softmax, padded q rows are sliced off.
- Backward pass: recompute-based custom VJP (the standard flash-attention
  trade: extra FLOPs for zero residual memory). The recomputation runs
  through the same fused kernel for the forward values and closed-form
  softmax gradients in XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _pad_to(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Reference (XLA) attention — also the fallback and the VJP recompute path
# ---------------------------------------------------------------------------

def _mask_bias(lq: int, lkv: int, causal: bool, prefix_len: int,
               kv_mask: Optional[jnp.ndarray], q_offset: int = 0) -> jnp.ndarray:
    """Additive bias [*, lq, lkv]; kv_mask is [B, lkv] bool (True = attend)."""
    bias = jnp.zeros((1, 1, lq, lkv), jnp.float32)
    if causal:
        q_idx = jnp.arange(lq)[:, None] + q_offset
        k_idx = jnp.arange(lkv)[None, :]
        # prefix-causal: visual block (k < P) always visible; text causal.
        allowed = (k_idx < prefix_len) | (k_idx <= q_idx)
        bias = jnp.where(allowed[None, None], bias, _NEG_INF)
    if kv_mask is not None:
        kvb = jnp.where(kv_mask[:, None, None, :], 0.0, _NEG_INF)
        bias = bias + kvb
    return bias


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                  causal: bool = False, prefix_len: int = 0,
                  kv_mask: Optional[jnp.ndarray] = None,
                  bias: Optional[jnp.ndarray] = None,
                  scale: Optional[float] = None,
                  dropout_rate: float = 0.0,
                  dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Plain XLA attention. q,k,v: [B, H, L, D]. Used on CPU and for grads.

    ``bias``: optional additive attention bias broadcastable to
    [B, H, Lq, Lkv] (e.g. TinyViT's learned relative-position biases).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + _mask_bias(q.shape[2], k.shape[2], causal, prefix_len,
                                 kv_mask)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas fused attention
# ---------------------------------------------------------------------------

def _make_kernel(scale: float, causal: bool, prefix_len: int, block_q: int,
                 lkv_valid: int, masked_kv: bool, block_h: int):
    from jax.experimental import pallas as pl  # deferred: CPU tests may lack TPU

    def kernel(q_ref, k_ref, v_ref, kvm_ref, o_ref):
        bi = pl.program_id(0)
        qi = pl.program_id(2)
        # Unrolled loop over the heads in this block: at short sequences
        # (CLIP's 257 tokens) one (batch, head, q-block) is a few
        # microseconds of work, so per-grid-step overhead dominates —
        # processing block_h heads per step amortizes it.
        for hh in range(block_h):
            q = q_ref[0, hh].astype(jnp.float32)       # [block_q, D]
            k = k_ref[0, hh].astype(jnp.float32)       # [Lkv, D]
            v = v_ref[0, hh].astype(jnp.float32)       # [Lkv, D]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [block_q, Lkv]

            lq_b, lkv = scores.shape
            k_idx = jax.lax.broadcasted_iota(jnp.int32, (lq_b, lkv), 1)
            valid = k_idx < lkv_valid                  # mask tile padding
            if causal:
                q_idx = jax.lax.broadcasted_iota(jnp.int32, (lq_b, lkv), 0)
                q_idx = q_idx + qi * block_q
                allowed = (k_idx < prefix_len) | (k_idx <= q_idx)
                valid = valid & allowed
            if masked_kv:
                kvm = kvm_ref[pl.ds(bi, 1), :] > 0     # [1, Lkv] key-validity
                valid = valid & kvm
            scores = jnp.where(valid, scores, _NEG_INF)

            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            # Padded/masked columns have scores = -1e30, so e underflows to
            # an exact 0.0 — any garbage in physically-padded V rows is
            # multiplied by zero and cannot reach valid outputs.
            z = jnp.sum(e, axis=-1, keepdims=True)
            probs = e / z
            out = jax.lax.dot_general(
                probs, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [block_q, D]
            o_ref[0, hh] = out.astype(o_ref.dtype)

    return kernel


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      kv_mask: Optional[jnp.ndarray], *, causal: bool,
                      prefix_len: int, scale: float,
                      block_q: int = 256, interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, d = q.shape
    lkv = k.shape[2]
    # ZERO host-side copies: Q/K/V/O keep their exact logical shapes and
    # Mosaic's partial-block handling supplies the tile padding (last q
    # block may be partial — its out-of-range rows are garbage the masked
    # write drops; K/V tile padding is masked by the lkv iota above). The
    # previous jnp.pad/slice approach re-materialized all of Q, K, V and O
    # in HBM (~190 MB per CLIP encode at batch 48) just to align tiles.
    # Head dim D stays unpadded too: a full-dim minor block is always legal
    # and the MXU handles a 64-wide contraction internally.
    # Pick the q-block to MINIMIZE partial-block waste, not to hit a fixed
    # power of two: lq=257 with block 256 would run a second block that is
    # 99.6% padding (2x the kernel work); instead use ceil(lq/nblocks)
    # rounded to the 8-row sublane, e.g. 257 -> one 264-row block,
    # 1582 -> four 400-row blocks.
    n_blocks = max(1, -(-lq // block_q))
    block_q = _round_up(-(-lq // n_blocks), 8)
    # Heads per grid step: as many as fit a conservative VMEM budget (the
    # f32 score matrix + exp intermediates dominate; K/V/Q tiles are small).
    per_head = (2.5 * block_q * lkv * 4
                + (block_q + 2 * lkv) * d * q.dtype.itemsize)
    block_h = max(1, min(h, int(6e6 // per_head)))
    while h % block_h:  # keep full blocks (divisor of h)
        block_h -= 1
    grid = (b, h // block_h, -(-lq // block_q))
    kernel = _make_kernel(scale, causal, prefix_len, block_q, lkv,
                          masked_kv=kv_mask is not None, block_h=block_h)
    if kv_mask is None:
        kvm = jnp.ones((1, 1), jnp.int32)  # placeholder, never read
        kvm_spec = pl.BlockSpec((1, 1), lambda bi, hi, qi: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kvm = kv_mask.astype(jnp.int32)
        # full-array block (kernel indexes its row via program_id): a
        # (1, Lkv) block would violate the (8, 128) tile rule
        kvm_spec = pl.BlockSpec((b, lkv), lambda bi, hi, qi: (0, 0),
                                memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, lkv, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, lkv, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            kvm_spec,
        ],
        out_specs=pl.BlockSpec((1, block_h, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lkv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * lq * lkv,
        ),
        interpret=interpret,
    )(q, k, v, kvm)
    return out


# ---------------------------------------------------------------------------
# Public entry with custom VJP (pallas fwd, recompute bwd)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_mask, causal, prefix_len, scale):
    return _pallas_attention(q, k, v, kv_mask, causal=causal,
                             prefix_len=prefix_len, scale=scale)


def _flash_fwd(q, k, v, kv_mask, causal, prefix_len, scale):
    out = _pallas_attention(q, k, v, kv_mask, causal=causal,
                            prefix_len=prefix_len, scale=scale)
    return out, (q, k, v, kv_mask)


def _flash_bwd(causal, prefix_len, scale, residuals, g):
    q, k, v, kv_mask = residuals
    # Recompute probs in fp32 and differentiate in closed form (XLA fuses).
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + _mask_bias(q.shape[2], k.shape[2], causal, prefix_len,
                                 kv_mask)
    probs = jax.nn.softmax(scores, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    dscores = probs * (dp - jnp.sum(probs * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", dscores, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dscores, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = False, prefix_len: int = 0,
                    kv_mask: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Fused attention; q,k,v: [B, H, L, D]. Pallas on TPU."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, kv_mask, causal, prefix_len, float(scale))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# Pallas pays off when the KV context is long enough that avoiding the HBM
# round-trip of the [Lq, Lkv] score matrix beats what pallas_call costs the
# surrounding program. Two v5e A/Bs disagree and the IN-CONTEXT one wins:
# - op-level (scripts/profile_attention.py, scan-isolated device time):
#   zero-copy kernel + waste-minimizing q blocks + head-blocked grid wins
#   2.1x at CLIP shapes (48x16x257x64: 0.75 vs 1.57 ms) and 2.6x at the
#   joint context (8x12x1582x64: 1.8 vs 4.7 ms);
# - whole-program (scripts/ab_teacher_attention.py, full teacher fwd B8):
#   min_kv_len 192 -> 171.7 ms, 512 -> 149.7 ms, XLA-only -> 152.7 ms.
# In context, XLA fuses the (b,l,h,d)->(b,h,l,d) head transposes into its
# attention einsums, while an opaque pallas_call forces Q/K/V to be
# materialized in the transposed layout first — at CLIP sizes (24 layers x
# 75 MB) those copies cost more than the kernel saves. So Pallas only runs
# where the score matrix is big enough to dominate: the 1582-token joint
# teacher context. The student's tiny decode/cross shapes also stay XLA.
PALLAS_MIN_KV_LEN = 512


def set_pallas_min_kv_len(value: int) -> None:
    """Tune the pallas-vs-XLA dispatch threshold (tests/benchmarks)."""
    global PALLAS_MIN_KV_LEN
    PALLAS_MIN_KV_LEN = value


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                         causal: bool = False, prefix_len: int = 0,
                         kv_mask: Optional[jnp.ndarray] = None,
                         bias: Optional[jnp.ndarray] = None,
                         scale: Optional[float] = None,
                         dropout_rate: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None,
                         use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Dispatching MHA: Pallas fused kernel on TPU (no attention-dropout,
    no arbitrary bias), XLA fallback elsewhere.

    The reference applied dropout inside SDPA (torch default). Here
    attention-probs dropout and learned additive biases route to the XLA
    path (XLA fuses these fine at window-attention sizes); the Pallas kernel
    covers the long-sequence decoder/teacher paths.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    wants_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if use_pallas is None:
        use_pallas = (_on_tpu() and not wants_dropout and bias is None
                      and k.shape[2] >= PALLAS_MIN_KV_LEN)
    if use_pallas:
        return flash_attention(q, k, v, causal=causal, prefix_len=prefix_len,
                               kv_mask=kv_mask, scale=scale)
    return xla_attention(q, k, v, causal=causal, prefix_len=prefix_len,
                         kv_mask=kv_mask, bias=bias, scale=scale,
                         dropout_rate=dropout_rate if wants_dropout else 0.0,
                         dropout_rng=dropout_rng)
