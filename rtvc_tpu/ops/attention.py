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
                  dropout_rng: Optional[jax.Array] = None,
                  softmax_in_input_dtype: bool = False) -> jnp.ndarray:
    """Plain XLA attention. q,k,v: [B, H, L, D]. Used on CPU and for grads.

    ``bias``: optional additive attention bias broadcastable to
    [B, H, Lq, Lkv] (e.g. TinyViT's learned relative-position biases).

    ``softmax_in_input_dtype``: keep scores/softmax in q.dtype instead of
    f32 (MXU still accumulates the GEMMs in f32). At bf16 this removes
    the dominant cost of small-window attention — the f32 score-tensor
    materialization — measured 7.4x on the stage-2 core and -6.3 ms per
    48-frame TinyViT encode (docs/PERF.md §1b, scripts/
    ab_window_attention.py); max output delta 6e-3 vs the f32 path on
    random weights. Default off: the teacher tower and decoder keep f32
    softmax for conversion parity.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    acc_t = jnp.dtype(q.dtype if softmax_in_input_dtype else jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=acc_t) * jnp.asarray(scale, acc_t)
    scores = scores + _mask_bias(q.shape[2], k.shape[2], causal, prefix_len,
                                 kv_mask).astype(acc_t)
    if bias is not None:
        scores = scores + bias.astype(acc_t)
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

def _dropout_bits(seed, bi, ghi, qi, shape, block_q):
    """Counter-based uniform uint32 per attention-matrix element, from the
    GLOBAL (seed, batch, head, query-row, key-col) coordinates — so the
    backward kernel regenerates a bit-identical mask regardless of how
    either pass blocked the grid, and no [Lq, Lkv] mask tensor ever exists
    in HBM. Plain vector integer ops (murmur3-style fmix) run identically
    on the TPU VPU and in interpret mode (pltpu.prng_seed has no CPU
    lowering in this jax version)."""
    rows, cols = shape
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(
        qi * block_q)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(0x9E3779B1)) ^ (c * jnp.uint32(0x85EBCA77))
    x = x ^ (seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    x = x ^ (jnp.uint32(bi) * jnp.uint32(0x27D4EB2F)
             + jnp.uint32(ghi) * jnp.uint32(0x165667B1))
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def _block_probs(k_ref, v_ref, kvm_ref, q, hh, bi, qi, *, scale, causal,
                 prefix_len, block_q, lkv_valid, masked_kv, dropout_rate,
                 seed_ref, ghi, native_score_dot=False, softmax_native=False):
    """Shared fwd/bwd block computation: masked softmax probabilities for one
    (batch, head, q-block), plus the dropout-applied variant.

    ``q`` arrives in its REF dtype. ``native_score_dot`` feeds the raw
    bf16 operands to the score matmul (MXU multiplies bf16 exactly and
    accumulates f32 — same products as upcasting first, only the
    accumulation tree may differ); off upcasts to f32 before the dot,
    the round-2 shipping behavior. A/B: scripts/ab_joint_dtype.py.

    ``softmax_native`` keeps the [block_q, Lkv] score tensor and the
    exp in the REF dtype (the §1b window-attention lever applied inside
    the kernel): the MXU emits bf16 scores directly, max/sub/exp run at
    2x VPU width, and the returned probs stay bf16 so the AV matmul gets
    native operands. The row normalizer z is still ACCUMULATED in f32
    (a bf16 sum over 1582 terms would lose ~log2(n) ULPs) and applied as
    a f32-reciprocal multiply. Returned probs then carry one bf16
    rounding each; A/B + teacher-logit delta: scripts/ab_joint_softmax.py."""
    import jax.experimental.pallas as pl

    k_raw = k_ref[0, hh]                               # [Lkv, D]
    v = v_ref[0, hh].astype(jnp.float32)               # [Lkv, D]
    acc_t = q.dtype if softmax_native else jnp.float32
    if native_score_dot or softmax_native:
        qs, ks = q, k_raw
    else:
        qs, ks = q.astype(jnp.float32), k_raw.astype(jnp.float32)
    k = k_raw.astype(jnp.float32)
    # Mosaic only lowers 32-bit matmul accumulators, so the dot itself is
    # always pref=f32; softmax_native narrows the RESULT — one truncating
    # cast, after which every downstream VPU op runs at bf16 width.
    scores = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(acc_t) \
        * jnp.asarray(scale, acc_t)

    lq_b, lkv = scores.shape
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (lq_b, lkv), 1)
    valid = k_idx < lkv_valid                          # mask tile padding
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (lq_b, lkv), 0)
        q_idx = q_idx + qi * block_q
        allowed = (k_idx < prefix_len) | (k_idx <= q_idx)
        valid = valid & allowed
    if masked_kv:
        kvm = kvm_ref[pl.ds(bi, 1), :] > 0             # [1, Lkv] key-validity
        valid = valid & kvm
    # _NEG_INF = -1e30 is representable in bf16 (same exponent range as
    # f32), so the masked-columns-underflow-to-exact-0 property below
    # holds in both dtypes.
    scores = jnp.where(valid, scores, jnp.asarray(_NEG_INF, acc_t))

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    # Padded/masked columns have scores = -1e30, so e underflows to an
    # exact 0.0 — any garbage in physically-padded V rows is multiplied
    # by zero and cannot reach valid outputs.
    z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    if softmax_native:
        # Normalize via a [rows, 1] f32-reciprocal rounded to bf16 and a
        # bf16 broadcast-multiply — an exact-f32 division would upcast the
        # whole score-shaped e tensor, forfeiting the VPU width win. Cost:
        # one extra bf16 rounding on probs that are bf16 anyway.
        probs = e * (1.0 / z).astype(acc_t)
    else:
        probs = e / z

    if dropout_rate > 0.0:
        bits = _dropout_bits(seed_ref[0], bi, ghi, qi, (lq_b, lkv), block_q)
        thresh = jnp.uint32(int(dropout_rate * (2 ** 32)))
        keep = bits >= thresh
        probs_used = jnp.where(keep,
                               probs / jnp.asarray(1.0 - dropout_rate, acc_t),
                               jnp.asarray(0.0, acc_t))
    else:
        probs_used = probs
    return probs, probs_used, k, v


def _make_kernel(scale: float, causal: bool, prefix_len: int, block_q: int,
                 lkv_valid: int, masked_kv: bool, block_h: int,
                 dropout_rate: float = 0.0, native_score_dot: bool = False,
                 softmax_native: bool = False):
    from jax.experimental import pallas as pl  # deferred: CPU tests may lack TPU

    def kernel(*refs):
        if dropout_rate > 0.0:
            seed_ref, q_ref, k_ref, v_ref, kvm_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, kvm_ref, o_ref = refs
            seed_ref = None
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        qi = pl.program_id(2)
        # Unrolled loop over the heads in this block: at short sequences
        # (CLIP's 257 tokens) one (batch, head, q-block) is a few
        # microseconds of work, so per-grid-step overhead dominates —
        # processing block_h heads per step amortizes it.
        for hh in range(block_h):
            q = q_ref[0, hh]                           # [block_q, D] ref dtype
            _, probs, _, v = _block_probs(
                k_ref, v_ref, kvm_ref, q, hh, bi, qi,
                scale=scale, causal=causal, prefix_len=prefix_len,
                block_q=block_q, lkv_valid=lkv_valid, masked_kv=masked_kv,
                dropout_rate=dropout_rate, seed_ref=seed_ref,
                ghi=hi * block_h + hh, native_score_dot=native_score_dot,
                softmax_native=softmax_native)
            if softmax_native:
                # probs are bf16: give the AV matmul native operands too
                # (v's f32->bf16 cast folds back to the ref load).
                v = v.astype(probs.dtype)
            out = jax.lax.dot_general(
                probs, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [block_q, D]
            o_ref[0, hh] = out.astype(o_ref.dtype)

    return kernel


def _block_geometry(lq: int, lkv: int, d: int, h: int, itemsize: int,
                    block_q: int, max_block_h: Optional[int] = None):
    """(block_q, block_h) used by BOTH fwd and bwd kernels — the dropout
    PRNG is seeded per (batch, global-head, q-block), so the q-block
    decomposition must be identical in the two passes."""
    n_blocks = max(1, -(-lq // block_q))
    block_q = _round_up(-(-lq // n_blocks), 8)
    per_head = (2.5 * block_q * lkv * 4
                + (block_q + 2 * lkv) * d * itemsize)
    block_h = max(1, min(h, int(6e6 // per_head)))
    if max_block_h is not None:
        block_h = min(block_h, max_block_h)
    while h % block_h:  # keep full blocks (divisor of h)
        block_h -= 1
    return block_q, block_h


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      kv_mask: Optional[jnp.ndarray], *, causal: bool,
                      prefix_len: int, scale: float,
                      dropout_rate: float = 0.0,
                      seed: Optional[jnp.ndarray] = None,
                      block_q: int = 256, interpret: bool = False,
                      native_score_dot: bool = False,
                      softmax_native: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if softmax_native and q.dtype == jnp.float32:
        softmax_native = False  # ref dtype IS f32 — nothing to narrow

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
    # power of two: lq=257 with block 256 would otherwise run a second
    # block that is 99.6% padding (2x the kernel work). _block_geometry
    # keeps n_blocks = ceil(lq/block_q) but shrinks the block to
    # ceil(lq/n_blocks) rounded up to the 8-row sublane, spreading rows
    # evenly: 257 -> two 136-row blocks (15 padded rows total, vs 255),
    # 1582 -> seven 232-row blocks (42 padded rows). (A floor-based
    # n_blocks would instead run fewer, bigger blocks — one 264-row block
    # at 257, six at 1582; scripts/ab_block_geometry.py A/Bs the two on
    # hardware.) block_h = heads per grid step: as many
    # as fit a conservative VMEM budget (the f32 score matrix + exp
    # intermediates dominate; K/V/Q tiles are small).
    block_q, block_h = _block_geometry(lq, lkv, d, h, q.dtype.itemsize,
                                       block_q)
    grid = (b, h // block_h, -(-lq // block_q))
    kernel = _make_kernel(scale, causal, prefix_len, block_q, lkv,
                          masked_kv=kv_mask is not None, block_h=block_h,
                          dropout_rate=dropout_rate,
                          native_score_dot=native_score_dot,
                          softmax_native=softmax_native)
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

    in_specs = [
        pl.BlockSpec((1, block_h, block_q, d),
                     lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_h, lkv, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_h, lkv, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        kvm_spec,
    ]
    inputs = [q, k, v, kvm]
    if dropout_rate > 0.0:
        if seed is None:
            raise ValueError("dropout_rate > 0 requires a seed")
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.insert(0, seed.astype(jnp.int32).reshape(1))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
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
    )(*inputs)
    return out


# ---------------------------------------------------------------------------
# Pallas backward kernel (flash backward: recompute probs, closed-form grads)
# ---------------------------------------------------------------------------

def _make_bwd_kernel(scale: float, causal: bool, prefix_len: int,
                     block_q: int, lkv_valid: int, masked_kv: bool,
                     dropout_rate: float, lq_valid: int,
                     native_score_dot: bool = False,
                     softmax_native: bool = False):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if dropout_rate > 0.0:
            (seed_ref, q_ref, k_ref, v_ref, g_ref, kvm_ref,
             dq_ref, dk_ref, dv_ref) = refs
        else:
            (q_ref, k_ref, v_ref, g_ref, kvm_ref,
             dq_ref, dk_ref, dv_ref) = refs
            seed_ref = None
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        qi = pl.program_id(2)

        # dK/dV accumulate across the q-blocks of one (batch, head): the
        # grid iterates qi innermost, so the accumulator block stays
        # resident in VMEM between revisits.
        @pl.when(qi == 0)
        def _init():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            dv_ref[...] = jnp.zeros_like(dv_ref)

        q_raw = q_ref[0, 0]                            # [block_q, D] ref dtype
        # Zero the padded rows of the last (partial) q block FIRST: their
        # loads are unspecified (NaN in interpret mode) and 0 * NaN = NaN
        # would poison the dK accumulation even through zeroed dS rows.
        lq_b = q_raw.shape[0]
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, (lq_b, 1), 0)
                  + qi * block_q) < lq_valid
        q_raw = jnp.where(row_ok, q_raw, 0)
        # block_h is pinned to 1 in the backward pass, so the global head
        # index is just hi — matching the forward's (seed, b, head, qblock)
        # PRNG tuple bit-for-bit.
        probs, probs_used, k, v = _block_probs(
            k_ref, v_ref, kvm_ref, q_raw, 0, bi, qi,
            scale=scale, causal=causal, prefix_len=prefix_len,
            block_q=block_q, lkv_valid=lkv_valid, masked_kv=masked_kv,
            dropout_rate=dropout_rate, seed_ref=seed_ref, ghi=hi,
            native_score_dot=native_score_dot, softmax_native=softmax_native)
        # softmax_native returns bf16 probs (the same values the forward
        # used); the gradient math below stays f32 for accumulation.
        probs = probs.astype(jnp.float32)
        probs_used = probs_used.astype(jnp.float32)
        q = q_raw.astype(jnp.float32)
        g = g_ref[0, 0].astype(jnp.float32)            # [block_q, D]

        # Same for the probs/grad rows: unlike the forward (where garbage
        # rows only write garbage rows that the masked write drops), here
        # they would contaminate the dK/dV accumulators.
        probs = jnp.where(row_ok, probs, 0.0)
        probs_used = jnp.where(row_ok, probs_used, 0.0)
        g = jnp.where(row_ok, g, 0.0)

        # out = drop(P) V;  dV = drop(P)^T dO;  dP~ = dO V^T
        dv = jax.lax.dot_general(probs_used, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp_used = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # dP = dP~ * M / (1-rate). M only matters where P > 0 (dS has
            # a P factor), and there M == (drop(P) > 0) — so the kept-mask
            # is recovered without touching the PRNG again.
            dp = jnp.where(probs_used > 0.0, dp_used / (1.0 - dropout_rate),
                           0.0)
        else:
            dp = dp_used
        # softmax VJP: dS = P * (dP - rowsum(P * dP))
        ds = probs * (dp - jnp.sum(probs * dp, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, 0] = dq
        dk_ref[0, 0] += dk
        dv_ref[0, 0] += dv

    return kernel


def _pallas_attention_bwd(q, k, v, kv_mask, g, *, causal: bool,
                          prefix_len: int, scale: float,
                          dropout_rate: float = 0.0,
                          seed: Optional[jnp.ndarray] = None,
                          block_q: int = 256, interpret: bool = False,
                          native_score_dot: bool = False,
                          softmax_native: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if softmax_native and q.dtype == jnp.float32:
        softmax_native = False  # mirror the forward's demotion
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    block_q, _ = _block_geometry(lq, lkv, d, h, q.dtype.itemsize, block_q)
    grid = (b, h, -(-lq // block_q))
    kernel = _make_bwd_kernel(scale, causal, prefix_len, block_q, lkv,
                              masked_kv=kv_mask is not None,
                              dropout_rate=dropout_rate, lq_valid=lq,
                              native_score_dot=native_score_dot,
                              softmax_native=softmax_native)
    if kv_mask is None:
        kvm = jnp.ones((1, 1), jnp.int32)  # placeholder, never read
        kvm_spec = pl.BlockSpec((1, 1), lambda bi, hi, qi: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kvm = kv_mask.astype(jnp.int32)
        kvm_spec = pl.BlockSpec((b, lkv), lambda bi, hi, qi: (0, 0),
                                memory_space=pltpu.VMEM)

    qspec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, lkv, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec, qspec, kvm_spec]
    inputs = [q, k, v, g, kvm]
    if dropout_rate > 0.0:
        if seed is None:
            raise ValueError("dropout_rate > 0 requires a seed")
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.insert(0, seed.astype(jnp.int32).reshape(1))

    f32 = jnp.float32  # accumulate dK/dV exactly; cast to input dtype after
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[jax.ShapeDtypeStruct((b, h, lq, d), f32),
                   jax.ShapeDtypeStruct((b, h, lkv, d), f32),
                   jax.ShapeDtypeStruct((b, h, lkv, d), f32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * lq * lkv * d,
            bytes_accessed=(q.size * 2 + k.size * 2 + v.size * 2) * 4,
            transcendentals=b * h * lq * lkv,
        ),
        interpret=interpret,
    )(*inputs)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# Public entry with custom VJP (pallas fwd, pallas bwd)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, kv_mask, seed, causal, prefix_len, scale, dropout_rate,
           native_score_dot, softmax_native):
    return _pallas_attention(q, k, v, kv_mask, causal=causal,
                             prefix_len=prefix_len, scale=scale,
                             dropout_rate=dropout_rate, seed=seed,
                             interpret=not _on_tpu(),
                             native_score_dot=native_score_dot,
                             softmax_native=softmax_native)


def _flash_fwd(q, k, v, kv_mask, seed, causal, prefix_len, scale,
               dropout_rate, native_score_dot, softmax_native):
    out = _pallas_attention(q, k, v, kv_mask, causal=causal,
                            prefix_len=prefix_len, scale=scale,
                            dropout_rate=dropout_rate, seed=seed,
                            interpret=not _on_tpu(),
                            native_score_dot=native_score_dot,
                            softmax_native=softmax_native)
    return out, (q, k, v, kv_mask, seed)


def _flash_bwd(causal, prefix_len, scale, dropout_rate, native_score_dot,
               softmax_native, residuals, g):
    q, k, v, kv_mask, seed = residuals
    dq, dk, dv = _pallas_attention_bwd(
        q, k, v, kv_mask, g, causal=causal, prefix_len=prefix_len,
        scale=scale, dropout_rate=dropout_rate, seed=seed,
        interpret=not _on_tpu(), native_score_dot=native_score_dot,
        softmax_native=softmax_native)
    return (dq, dk, dv, None, None)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    causal: bool = False, prefix_len: int = 0,
                    kv_mask: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None,
                    dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    native_score_dot: Optional[bool] = None,
                    softmax_in_input_dtype: Optional[bool] = None
                    ) -> jnp.ndarray:
    """Fused attention; q,k,v: [B, H, L, D]. Pallas on TPU (interpret mode
    elsewhere — production CPU paths route to xla_attention upstream).

    ``dropout_rate`` > 0 applies attention-probs dropout INSIDE the kernel
    via the TPU per-core PRNG; the backward kernel regenerates the identical
    mask from the same (seed, batch, head, q-block) tuple, so no [Lq, Lkv]
    mask tensor is ever materialized (the reference applied dropout inside
    cuDNN SDPA, reference model.py:75-78 via nn.TransformerDecoderLayer).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  jnp.iinfo(jnp.int32).max, jnp.int32)
    else:
        seed = None
    if native_score_dot is None:
        native_score_dot = SCORE_DOT_NATIVE
    if softmax_in_input_dtype is None:
        softmax_in_input_dtype = SOFTMAX_NATIVE_PALLAS
    return _flash(q, k, v, kv_mask, seed, causal, prefix_len, float(scale),
                  float(dropout_rate), bool(native_score_dot),
                  bool(softmax_in_input_dtype))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# BLHD-native fused attention (ROADMAP #7 experiment)
# ---------------------------------------------------------------------------

# Opt-in flag for the CLIP tower to use the layout-native kernel below.
# EXPERIMENT RESULT (scripts/ab_teacher_attention.py --blhd, v5e): the
# current Mosaic cannot lower the per-head strided read from a
# [L, block_h, D] VMEM block ("infer-vector-layout: unsupported shape
# cast") — with the head axis on sublanes, slicing one head is a relayout
# Mosaic refuses. The kernel is correct in interpret mode (pinned by
# tests/test_ops.py::test_blhd_attention_matches_xla); revisit when Mosaic
# grows sublane-strided slicing. Until then XLA keeps the CLIP shapes
# (its transpose+attention fusion is the in-context winner, §PALLAS_MIN_KV_LEN).
USE_BLHD_CLIP = False


def set_blhd_clip(value: bool) -> None:
    global USE_BLHD_CLIP
    USE_BLHD_CLIP = value

def _make_blhd_kernel(scale: float, block_h: int):
    """Bidirectional, maskless attention consuming [B, L, H, D] directly —
    the layout the QKV GEMM produces — so the surrounding program never
    materializes the (b,l,h,d)->(b,h,l,d) transpose that makes the BHLD
    kernel lose in context at CLIP shapes (docs/PERF.md §2)."""
    from jax.experimental import pallas as pl  # noqa: F401

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for hh in range(block_h):
            q = q_ref[0, :, hh, :].astype(jnp.float32)   # [Lq, D]
            k = k_ref[0, :, hh, :].astype(jnp.float32)   # [Lkv, D]
            v = v_ref[0, :, hh, :].astype(jnp.float32)   # [Lkv, D]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                probs, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, :, hh, :] = out.astype(o_ref.dtype)

    return kernel


def blhd_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   scale: Optional[float] = None,
                   interpret: bool = False) -> jnp.ndarray:
    """q/k/v: [B, L, H, D] (no transpose needed from the packed-QKV GEMM).
    Bidirectional, no masks — exactly the CLIP image-tower case. Single
    q-block per (batch, head-block): CLIP's 257 tokens fit VMEM whole."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    # In BLHD blocks the head axis is the SUBLANE dim: the block's h extent
    # must be a multiple of 8 or the full h (TPU tile rule). Pick the
    # largest 8-multiple divisor of h that fits the VMEM budget.
    per_head = 2.5 * l * l * 4 + 3 * l * d * q.dtype.itemsize
    budget_h = max(1, int(6e6 // per_head))
    block_h = h
    for cand in range(8 * (budget_h // 8), 7, -8):
        if h % cand == 0:
            block_h = cand
            break
    else:
        block_h = h  # small-h fallback: full-dim block is always legal
    grid = (b, h // block_h)
    spec = pl.BlockSpec((1, l, block_h, d), lambda bi, hi: (bi, 0, hi, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_blhd_kernel(float(scale), block_h),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, l, h, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l * l * d,
            bytes_accessed=3 * q.size * q.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Window attention with in-kernel learned bias (VERDICT r3 #2)
# ---------------------------------------------------------------------------

# Route TinyViT's window attention ([B·nW, H, N, D], N = 49/196, learned
# relative-position bias [H, N, N]) through the fused Pallas kernel below
# instead of XLA. EXPERIMENT RESULT (scripts/ab_window_pallas.py, v5e,
# 2026-08-19, docs/PERF.md §1b addendum): the kernel is CORRECT (f32
# parity 7e-7 vs a HIGHEST-precision reference — tighter than the XLA
# path's own 1-2e-2 under this terminal's --xla_allow_excess_precision)
# but LOSES on speed: whole-encoder 11.73 ms vs XLA's 8.68 (0.74x);
# stage1 core (768 win x 49 tok) 0.926 vs 0.190 ms — XLA's batched-
# small-matmul lowering beats Mosaic's serialized per-window tpu.matmul
# at every block size tried (C = 8-128, batched and unrolled). Mixed
# routing (Pallas only at N=196, the one isolated-core win at 1.09x)
# also loses in context: 10.31 ms — the pallas_call boundary costs more
# than the kernel saves, the same in-context effect as PALLAS_MIN_KV_LEN.
# Default OFF; kernel + tests stay as the recorded experiment.
USE_WINDOW_PALLAS = False


def set_window_pallas(value: bool) -> None:
    """Flip the TinyViT window-attention Pallas route (trace-time)."""
    global USE_WINDOW_PALLAS
    USE_WINDOW_PALLAS = bool(value)


def _window_block(b: int, n: int, d: int, acc_bytes: int) -> int:
    """Windows per kernel instance: the largest divisor of the window-batch
    whose PADDED [C, N, N] score tile (N=49 pads to 56/64 sublanes × 128
    lanes — padding, not N², is what occupies VMEM) stays within ~1.25 MB,
    leaving room inside the 16 MB scoped limit for the ~4 live
    score-shaped temporaries (s, e, p, dot buffers) plus the
    double-buffered q/k/v/out tiles."""
    sub = 8 if acc_bytes >= 4 else 16
    padded = _round_up(n, sub) * _round_up(n, 128) * acc_bytes \
        + 2 * _round_up(n, sub) * _round_up(d, 128) * acc_bytes
    budget = int(1.25e6 // padded) or 1
    c = 1
    for cand in range(2, min(b, 128, budget) + 1):
        if b % cand == 0:
            c = cand
    return c


def _make_window_kernel(scale: float, acc_t, out_t):
    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        q = q_ref[:, 0]                    # [C, N, D]
        k = k_ref[:, 0]
        v = v_ref[:, 0]
        # scores in acc_t: f32 for parity mode, q.dtype (bf16) for the
        # shipping softmax_in_input_dtype mode — MXU accumulation itself
        # is controlled by preferred_element_type exactly as in
        # xla_attention, so the kernel is numerics-compatible with the
        # XLA path it replaces.
        # Matmul dtypes: Mosaic requires a 32-bit accumulator for the
        # batched tpu.matmul, so both dots accumulate f32 regardless of
        # mode (the XLA path's MXU accumulation is f32 too). f32 operands
        # additionally take HIGHEST precision: this terminal sets
        # --xla_allow_excess_precision, under which DEFAULT lowers the
        # f32 dot as a single bf16 MXU pass (~7e-2 raw-score error vs the
        # true f32 product) — the f32 parity mode is therefore MORE
        # accurate than the XLA path it replaces. The acc_t (bf16) lever
        # applies to the score TENSOR + softmax arithmetic, mirroring
        # xla_attention's softmax_in_input_dtype.
        prec = (jax.lax.Precision.HIGHEST
                if q.dtype == jnp.float32 else None)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        s = (s * scale).astype(acc_t) + b_ref[0][None].astype(acc_t)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(out_t)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        o_ref[:, 0] = o.astype(o_ref.dtype)

    return kernel


def _window_attention_fwd_pallas(q, k, v, bias, scale: float,
                                 softmax_in_input_dtype: bool,
                                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    acc_t = jnp.dtype(q.dtype if softmax_in_input_dtype else jnp.float32)
    c = _window_block(b, n, d, acc_t.itemsize)
    qkv_spec = pl.BlockSpec((c, 1, n, d), lambda i, hh: (i, hh, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, n, n), lambda i, hh: (hh, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_window_kernel(float(scale), acc_t, v.dtype),
        grid=(b // c, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize + bias.size * 4,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _window_attention(q, k, v, bias, scale, softmax_in_input_dtype,
                      interpret):
    return _window_attention_fwd_pallas(q, k, v, bias, scale,
                                        softmax_in_input_dtype, interpret)


def _window_attention_fwd(q, k, v, bias, scale, softmax_in_input_dtype,
                          interpret):
    out = _window_attention_fwd_pallas(q, k, v, bias, scale,
                                       softmax_in_input_dtype, interpret)
    return out, (q, k, v, bias)


def _window_attention_bwd(scale, softmax_in_input_dtype, interpret,
                          res, g):
    """Explicit attention backward (recompute-probs flavour): exactly the
    VJP of the kernel's math, written in XLA ops — the backward was never
    the window bottleneck (it is matmul-shaped like the forward and XLA
    fuses it fine), and recomputing probs here means the forward kernel
    stores NO residual score tensor."""
    q, k, v, bias = res
    acc_t = jnp.dtype(q.dtype if softmax_in_input_dtype else jnp.float32)
    # same precision policy as the forward kernel: exact f32 products in
    # parity mode (this terminal's --xla_allow_excess_precision would
    # otherwise drop the recomputed probs to single bf16 passes)
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=prec,
                   preferred_element_type=jnp.float32) * scale
    s = s.astype(acc_t) + bias[None].astype(acc_t)
    p = jax.nn.softmax(s, axis=-1)
    p_v = p.astype(v.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p_v, g, precision=prec)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v, precision=prec,
                    preferred_element_type=jnp.float32).astype(acc_t)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_scaled = ds * jnp.asarray(scale, acc_t)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds_scaled, k,
                    precision=prec).astype(q.dtype)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds_scaled, q,
                    precision=prec).astype(k.dtype)
    dbias = jnp.sum(ds.astype(jnp.float32), axis=0).astype(bias.dtype)
    return dq, dk, dv.astype(v.dtype), dbias


_window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, *, scale: Optional[float] = None,
                     softmax_in_input_dtype: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused window attention with the learned relative-position bias added
    IN-KERNEL (TinyViT WindowAttention, reference timm tiny_vit.py hot loop
    / model.py:114-133). q/k/v: [B·nW, H, N, D]; bias: [H, N, N] f32.

    One grid instance handles C windows of one head: batched QKᵀ (Mosaic
    lowers the batch dim), scale+bias, softmax and PV all run on a VMEM
    score tile — the [B·nW·H, N, N] score tensor never exists in HBM.
    Numerics mirror ``xla_attention(bias=...)`` in both softmax dtype
    modes; gradients (incl. dbias) come from the explicit recompute
    backward above.
    """
    b, h, n, d = q.shape
    assert bias.shape == (h, n, n), (bias.shape, q.shape)
    if scale is None:
        scale = d ** -0.5
    return _window_attention(q, k, v, bias, float(scale),
                             bool(softmax_in_input_dtype), interpret)


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

# Score-matmul operand dtype inside the Pallas kernel: False upcasts
# q/k to f32 before the dot (round-2 shipping), True hands the raw bf16
# operands to the MXU (same exact products, f32 accumulation either way —
# only the accumulation tree may differ). A/B: scripts/ab_joint_dtype.py.
SCORE_DOT_NATIVE = False


def set_score_dot_native(value: bool) -> None:
    """Flip the Pallas score-dot operand dtype (A/B scripts; trace-time)."""
    global SCORE_DOT_NATIVE
    SCORE_DOT_NATIVE = bool(value)


# Keep the Pallas kernel's score tensor / softmax in the input dtype
# (bf16): the in-kernel analogue of xla_attention's
# ``softmax_in_input_dtype`` (the §1b window-attention lever). Row
# normalizers still accumulate in f32. Default per the joint-shape A/B
# (scripts/ab_joint_softmax.py; docs/PERF.md §1c). No-op for f32 inputs.
SOFTMAX_NATIVE_PALLAS = False


def set_softmax_native_pallas(value: bool) -> None:
    """Flip the Pallas in-kernel softmax dtype (A/B scripts; trace-time)."""
    global SOFTMAX_NATIVE_PALLAS
    SOFTMAX_NATIVE_PALLAS = bool(value)


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
                         use_pallas: Optional[bool] = None,
                         softmax_in_input_dtype: bool = False) -> jnp.ndarray:
    """Dispatching MHA: Pallas fused kernel on TPU for long-KV shapes
    (including attention-probs dropout, handled by the in-kernel PRNG and
    the matching backward kernel), XLA elsewhere.

    The reference applied dropout inside SDPA (torch default). Learned
    additive biases (TinyViT window attention) route to XLA — the fused
    window kernel (``window_attention``) exists and is opt-in via
    USE_WINDOW_PALLAS, but measured SLOWER in context (docs/PERF.md §1b
    round-4 addendum); the student's short sequences also stay XLA (see
    PALLAS_MIN_KV_LEN).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    wants_dropout = dropout_rate > 0.0 and dropout_rng is not None
    # use_pallas=False must force the XLA reference path for EVERY pallas
    # route (A/B and parity tests rely on it), so the window kernel only
    # engages when the caller left routing to the defaults
    if (bias is not None and USE_WINDOW_PALLAS and use_pallas is not False
            and _on_tpu()
            and not causal and kv_mask is None and not wants_dropout
            and q.shape == k.shape == v.shape
            and bias.shape in ((1,) + (q.shape[1], q.shape[2], k.shape[2]),
                               (q.shape[1], q.shape[2], k.shape[2]))):
        return window_attention(
            q, k, v, bias[0] if bias.ndim == 4 else bias, scale=scale,
            softmax_in_input_dtype=softmax_in_input_dtype)
    if use_pallas is None:
        use_pallas = (_on_tpu() and bias is None
                      and k.shape[2] >= PALLAS_MIN_KV_LEN)
    if use_pallas:
        return flash_attention(
            q, k, v, causal=causal, prefix_len=prefix_len, kv_mask=kv_mask,
            scale=scale, dropout_rate=dropout_rate if wants_dropout else 0.0,
            dropout_rng=dropout_rng,
            softmax_in_input_dtype=softmax_in_input_dtype or None)
    return xla_attention(q, k, v, causal=causal, prefix_len=prefix_len,
                         kv_mask=kv_mask, bias=bias, scale=scale,
                         dropout_rate=dropout_rate if wants_dropout else 0.0,
                         dropout_rng=dropout_rng,
                         softmax_in_input_dtype=softmax_in_input_dtype)
