"""Fixed-shape autoregressive decoding: greedy, student beam, teacher beam.

Rebuilds the three decode paths of the reference as jit-compiled
``lax.while_loop`` state machines over KV caches — the reference re-ran the
FULL decoder stack per generated token with no cache (reference
src/models/model.py:156-187, 189-317) and ran teacher beam search with
per-step host syncs (model.py:517-521 copies logits to CPU numpy every step).

Output-faithfulness notes (SURVEY.md checklist):

- ``student_greedy``: argmax of the last position each step, appended; stops
  early only when ALL batch rows emit SEP at the same step (model.py:184);
  tokens after a row's SEP keep generating exactly like the reference
  (no per-row freezing). Pad id 0 appearing in generated output re-masks the
  corresponding cache slot, matching the reference's ``y == 0`` key-padding
  mask on re-runs.
- ``student_beam``: the reference's EOS-free beam search (model.py:189-317):
  step-1 top-k seeds the beams, then per step a k x k candidate table is
  sorted descending (stable, beam-major order) and the top k rebuilt; the
  final answer is the highest-scoring beam at max_len. No length penalty,
  no EOS handling (commented out in the reference).
- ``teacher_beam``: GIT's ``GeneratorWithBeamSearch.search`` as modified by
  the reference (model.py:465-678): beam 4, max_steps 15, length penalty 0.6
  at add-time, BeamHypotheses pool (num_keep_best=1) with the old-HF
  ``is_done`` rule (worst >= best_sum / max_length**penalty), per-step EOS
  candidates added as hypotheses only while the next beam set is unfilled,
  forced hypothesis adds at the final step, pad = eos id, and the per-step
  RAW logits captured on-device into a [steps, B*beams, V] buffer (no host
  syncs) for distillation.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

PyTree = Any


def _gather_cache(caches: PyTree, rows: jnp.ndarray) -> PyTree:
    return jax.tree.map(lambda a: a[rows], caches)


# ===========================================================================
# Student greedy decode
# ===========================================================================

@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("max_len",))
def student_greedy(model, variables, frames: jnp.ndarray, max_len: int = 10,
                   vocab_w8=None) -> jnp.ndarray:
    """Greedy captioning (reference model.py:156-187). Returns
    [B, 1 + max_len] ids: CLS, generated tokens, 0-padding after early stop.

    ``vocab_w8``: optional weight-only int8 pack for the vocab projection
    (``quantization.quantize_vocab_head``) — opt-in decode-bandwidth lever;
    the exact bf16 projection is the default (see student.decode_step)."""

    def encode(mdl, x):
        _, memory = mdl.forward_image_enc(x)
        return memory

    memory = model.apply(variables, frames, method=encode)
    b = frames.shape[0]
    total = 1 + max_len

    caches = model.apply(variables, b, total, memory,
                         method=lambda mdl, b_, t_, m_: mdl.init_cache(b_, t_, m_))

    tokens = jnp.zeros((b, total), jnp.int32)
    tokens = tokens.at[:, 0].set(model.cls_token_id)

    def step_fn(state):
        tokens, caches, i, _ = state
        pos = jnp.arange(total)[None, :]
        # reference masks keys where y == 0 (model.py:143); generated PAD
        # tokens therefore vanish from self-attention on later steps too
        kv_mask = (pos <= i) & (tokens != 0)
        logits, caches = model.apply(
            variables, tokens[:, i], i, caches, kv_mask, vocab_w8,
            method=lambda mdl, t_, i_, c_, m_, vw_: mdl.decode_step(
                t_, i_, c_, m_, vocab_w8=vw_))
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], i + 1, axis=1)
        all_sep = jnp.all(nxt == model.sep_token_id)
        return tokens, caches, i + 1, all_sep

    def cond_fn(state):
        _, _, i, all_sep = state
        return (i < max_len) & jnp.logical_not(all_sep)

    tokens, _, _, _ = jax.lax.while_loop(
        cond_fn, step_fn, (tokens, caches, jnp.int32(0), jnp.bool_(False)))
    return tokens


# ===========================================================================
# Student beam search (EOS-free, reference semantics)
# ===========================================================================

@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("max_len", "k"))
def student_beam(model, variables, frames: jnp.ndarray, max_len: int = 10,
                 k: int = 3, vocab_w8=None) -> jnp.ndarray:
    """Beam captioning (reference model.py:189-317). Returns [B, max_len].

    ``vocab_w8``: optional weight-only int8 vocab projection (see
    :func:`student_greedy`)."""

    def encode(mdl, x):
        _, memory = mdl.forward_image_enc(x)
        return memory

    memory = model.apply(variables, frames, method=encode)
    b = frames.shape[0]
    total = max_len

    # --- step 0: feed CLS for the whole batch --------------------------------
    caches = model.apply(variables, b, total, memory,
                         method=lambda mdl, b_, t_, m_: mdl.init_cache(b_, t_, m_))
    cls = jnp.full((b,), model.cls_token_id, jnp.int32)
    logits0, caches = model.apply(
        variables, cls, jnp.int32(0), caches, None, vocab_w8,
        method=lambda mdl, t_, i_, c_, m_, vw_: mdl.decode_step(
            t_, i_, c_, m_, vocab_w8=vw_))
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32), axis=-1)
    scores, top_idx = jax.lax.top_k(logp0, k)        # [B, k]

    # sequences [B, k, total]: CLS at 0, first generated token at 1
    seqs = jnp.zeros((b, k, total), jnp.int32)
    seqs = seqs.at[:, :, 0].set(model.cls_token_id)
    seqs = seqs.at[:, :, 1].set(top_idx)

    # replicate caches per beam: row layout B-major → b * k + beam
    rep = jnp.repeat(jnp.arange(b), k)
    caches = _gather_cache(caches, rep)

    def step_fn(step, state):
        seqs, scores, caches = state
        last = seqs[:, :, step - 1].reshape(b * k)
        logits, new_caches = model.apply(
            variables, last, step - 1, caches, None, vocab_w8,
            method=lambda mdl, t_, i_, c_, m_, vw_: mdl.decode_step(
                t_, i_, c_, m_, vocab_w8=vw_))
        # top-k on the RAW logits in 2-D layout, then normalize only the k
        # winners: log_softmax is a per-row monotone shift (x - logsumexp),
        # so the selected indices, tie order and scores are identical. The
        # original form ran lax.top_k on the 3-D [B, k, V] log-probs — XLA
        # lowers >=2-D-batched top_k through a path ~400x slower than the
        # 2-D one at this shape, and that ONE op was ~97% of the beam decode
        # loop's device time (44.6 -> 1.1 ms for the 23-step loop; the
        # lsm_2d attribution arm in scripts/ab_beam_variants.py isolates the
        # 3-D top_k as the cost, not the log-softmax).
        raw = logits.astype(jnp.float32)                 # [B*k, V]
        top_raw, top_words = jax.lax.top_k(raw, k)       # [B*k, k]
        lse = jax.nn.logsumexp(raw, axis=-1, keepdims=True)
        top_scores = (top_raw - lse).reshape(b, k, k)
        top_words = top_words.reshape(b, k, k)
        cand_scores = (scores[:, :, None] + top_scores).reshape(b, k * k)
        cand_words = top_words.reshape(b, k * k)
        cand_beams = jnp.repeat(jnp.arange(k), k)[None, :]  # beam-major layout

        best_scores, best_idx = jax.lax.top_k(cand_scores, k)  # [B, k]
        sel_beams = jnp.take_along_axis(
            jnp.broadcast_to(cand_beams, (b, k * k)), best_idx, axis=1)
        sel_words = jnp.take_along_axis(cand_words, best_idx, axis=1)

        new_seqs = jnp.take_along_axis(seqs, sel_beams[:, :, None], axis=1)
        new_seqs = jax.lax.dynamic_update_slice_in_dim(
            new_seqs, sel_words[:, :, None], step, axis=2)

        rows = (jnp.arange(b)[:, None] * k + sel_beams).reshape(-1)
        new_caches = _gather_cache(new_caches, rows)
        return new_seqs, best_scores, new_caches

    seqs, scores, _ = jax.lax.fori_loop(2, max_len, step_fn,
                                        (seqs, scores, caches))
    best = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]


# ===========================================================================
# Teacher beam search (GIT semantics + per-step logit capture)
# ===========================================================================

class TeacherBeamOutput(NamedTuple):
    predictions: jnp.ndarray   # [B, max_steps] (starts with SOS, eos-padded)
    logprobs: jnp.ndarray      # [B] length-penalized best-hypothesis score
    logits: jnp.ndarray        # [max_steps - 1, B, beams, V] raw per-step logits
    num_steps: jnp.ndarray     # [] number of decode iterations actually run


def top_k_top_p_filtering(logits: jnp.ndarray, top_k: int = 0,
                          top_p: float = 0.0,
                          min_tokens_to_keep: int = 2) -> jnp.ndarray:
    """HF-style nucleus/top-k filtering (used by the reference's sampling
    beam path, model.py:537): kept logits pass through, the rest → -inf."""
    filtered = logits
    if top_k and top_k > 0:
        k = max(top_k, min_tokens_to_keep)
        kth = jnp.sort(filtered, axis=-1)[..., -k][..., None]
        filtered = jnp.where(filtered < kth, -jnp.inf, filtered)
    if top_p and top_p > 0.0:
        sorted_logits = jnp.sort(filtered, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # shift right: always keep the first token above the threshold
        remove_sorted = cum_probs > top_p
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
            axis=-1)
        remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
        # threshold value = smallest kept logit
        kept_min = jnp.min(jnp.where(remove_sorted, jnp.inf, sorted_logits),
                           axis=-1, keepdims=True)
        filtered = jnp.where(filtered < kept_min, -jnp.inf, filtered)
    return filtered


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("beam_size", "max_steps",
                                    "per_node_beam_size", "length_penalty",
                                    "repetition_penalty", "do_sample",
                                    "top_k", "top_p", "temperature"))
def teacher_beam(model, variables, frames: jnp.ndarray, *,
                 beam_size: int = 4, max_steps: int = 15,
                 per_node_beam_size: int = 2, length_penalty: float = 0.6,
                 repetition_penalty: float = 1.0, do_sample: bool = False,
                 top_k: int = 0, top_p: float = 0.0, temperature: float = 1.0,
                 rng: jax.Array | None = None) -> TeacherBeamOutput:
    """GIT beam search (reference model.py:465-678) as one XLA program.

    ``do_sample`` enables the reference's sampled-beam path
    (model.py:532-554): temperature → top-k/top-p filtering → sample
    ``per_node_beam_size`` words per beam without replacement (Gumbel
    top-k). Divergence note: the reference's sampling path mis-attributes
    source beams when per_node_beam_size != beam_size (its tiled
    ``beam_indices`` don't match the reshape grouping); here candidates
    carry their true source beam.
    """
    nb = beam_size
    pnbs = per_node_beam_size
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # GIT wires sos/eos from the BERT tokenizer (CLS=101 / SEP=102,
    # reference model.py:359-362); eos doubles as the pad id (model.py:487).
    sos, eos = 101, 102
    vocab = model.config.vocab_size

    visual = model.apply(variables, frames,
                         method=lambda mdl, f_: mdl.encode_only(f_))
    b = visual.shape[0]
    prefix = visual.shape[1]

    # replicate visual per beam, prefill caches with visual K/V
    visual_rep = jnp.repeat(visual, nb, axis=0)           # [B*nb, P, 1024]
    caches = model.apply(
        variables, visual_rep, max_steps,
        method=lambda mdl, v_, t_: mdl.init_cache(v_, t_))

    input_ids = jnp.full((b * nb, max_steps), sos, jnp.int32)
    valid_len = 1  # cur_len tracked as loop scalar below
    beam_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((nb - 1,), -1e9)]), b
    ).astype(jnp.float32)                                  # [B*nb]
    done = jnp.zeros((b,), jnp.bool_)

    hyp_best = jnp.full((b,), -1e5, jnp.float32)
    hyp_seq = jnp.full((b, max_steps), eos, jnp.int32)
    hyp_len = jnp.ones((b,), jnp.int32)
    hyp_count = jnp.zeros((b,), jnp.int32)

    logits_buf = jnp.zeros((max_steps - 1, b * nb, vocab), jnp.float32)

    def step_fn(state):
        (input_ids, cur_len, beam_scores, done, hyp_best, hyp_seq, hyp_len,
         hyp_count, caches, logits_buf) = state

        last = jax.lax.dynamic_index_in_dim(input_ids, cur_len - 1, axis=1,
                                            keepdims=False)
        raw_logits, caches = model.apply(
            variables, last, cur_len - 1, caches, prefix,
            method=lambda mdl, t_, i_, c_, p_: mdl.decode_step(t_, i_, c_, p_))
        raw_logits = raw_logits.astype(jnp.float32)        # [B*nb, V]
        logits_buf = jax.lax.dynamic_update_slice_in_dim(
            logits_buf, raw_logits[None], cur_len - 1, axis=0)

        scores_tok = raw_logits
        if repetition_penalty != 1.0:
            # CTRL-style penalty on already-generated tokens (model.py:524-531)
            onehot = jax.nn.one_hot(input_ids, vocab, dtype=jnp.bool_)
            mask = (jnp.arange(max_steps) < cur_len)[None, :, None]
            present = jnp.any(onehot & mask, axis=1)
            penalized = jnp.where(scores_tok < 0,
                                  scores_tok * repetition_penalty,
                                  scores_tok / repetition_penalty)
            scores_tok = jnp.where(present, penalized, scores_tok)

        if do_sample:
            # sampled-beam path (model.py:532-554): per-beam Gumbel top-k =
            # multinomial without replacement over the filtered distribution
            s = scores_tok / temperature if temperature != 1.0 else scores_tok
            s = top_k_top_p_filtering(s, top_k=top_k, top_p=top_p)
            step_rng = jax.random.fold_in(rng, cur_len)
            gumbel = jax.random.gumbel(step_rng, s.shape)
            perturbed = jnp.where(jnp.isfinite(s), s + gumbel, -jnp.inf)
            _, samp = jax.lax.top_k(perturbed, pnbs)       # [B*nb, pnbs]
            logp_row = jax.nn.log_softmax(s, axis=-1)
            samp_logp = jnp.take_along_axis(logp_row, samp, axis=-1)
            samp_scores = samp_logp + beam_scores[:, None]  # [B*nb, pnbs]
            next_scores = samp_scores.reshape(b, nb * pnbs)
            word_id = samp.reshape(b, nb * pnbs)
            beam_id = jnp.repeat(jnp.arange(nb), pnbs)[None, :]
            beam_id = jnp.broadcast_to(beam_id, (b, nb * pnbs))
        else:
            # Hierarchical exact top-k: the global top-m over the [nb * V]
            # candidate row can take at most m candidates from any one beam,
            # so per-beam top-m followed by a pooled top-m selects the same
            # set. log_softmax is a per-row monotone shift, so top-k runs on
            # the raw (penalized) logits and only the m winners are
            # normalized (+ beam score). Tie order is preserved: per-beam
            # top_k keeps lowest-word-index first, and the pooled index
            # (beam * m + rank) sorts ties beam-major exactly like the
            # original flat beam * V + word index (pinned by
            # tests/test_decode.py::test_hierarchical_topk_matches_flat_
            # selection). Avoids materializing the [B*nb, V] f32
            # log-softmax and sorting [B, nb*V] in-loop: full-size beam
            # 99.4 -> 80.0 ms device (1.24x, scripts/profile_teacher_beam
            # .py; docs/PERF.md 5b).
            m = pnbs * nb
            top_raw, top_word = jax.lax.top_k(scores_tok, m)   # [B*nb, m]
            lse = jax.nn.logsumexp(scores_tok, axis=-1, keepdims=True)
            top_logp = top_raw - lse + beam_scores[:, None]    # [B*nb, m]
            pooled = top_logp.reshape(b, nb * m)
            pooled_words = top_word.reshape(b, nb * m)
            next_scores, pick = jax.lax.top_k(pooled, m)       # [B, m]
            word_id = jnp.take_along_axis(pooled_words, pick, axis=1)
            beam_id = pick // m
        is_eos = word_id == eos

        # done check BEFORE consuming this step's candidates (model.py:578-581)
        best_possible = next_scores[:, 0]
        pool_done = (hyp_count >= 1) & (
            hyp_best >= best_possible / (max_steps ** length_penalty))
        done = done | pool_done

        at_max = cur_len + 1 == max_steps
        sel = jnp.logical_not(is_eos) & jnp.logical_not(at_max)
        cum = jnp.cumsum(sel.astype(jnp.int32), axis=1)
        processed = (cum - sel.astype(jnp.int32)) < nb  # before beam fills

        # --- hypothesis adds: eos candidates (or all, at max length) ---------
        hypable = processed & (is_eos | at_max) & jnp.logical_not(done)[:, None]
        hyp_cand_scores = jnp.where(
            hypable, next_scores / (cur_len ** length_penalty), -jnp.inf)
        best_cand = jnp.argmax(hyp_cand_scores, axis=1)          # [B]
        best_cand_score = jnp.take_along_axis(
            hyp_cand_scores, best_cand[:, None], axis=1)[:, 0]
        any_add = jnp.isfinite(best_cand_score)
        improves = any_add & (best_cand_score > hyp_best)
        src_beam = jnp.take_along_axis(beam_id, best_cand[:, None], axis=1)[:, 0]
        src_rows = jnp.arange(b) * nb + src_beam
        cand_seq = input_ids[src_rows]                            # [B, L]
        hyp_seq = jnp.where(improves[:, None], cand_seq, hyp_seq)
        hyp_len = jnp.where(improves, cur_len, hyp_len)
        hyp_best = jnp.where(improves, best_cand_score, hyp_best)
        hyp_count = hyp_count + jnp.sum(hypable, axis=1)

        # --- next beams: first nb non-eos candidates --------------------------
        beam_rank = jnp.where(sel, cum, nb + 1)  # 1-based rank for selected
        # for each slot r in [1, nb], find candidate with beam_rank == r
        slot_idx = jnp.argmax(
            beam_rank[:, None, :] == (jnp.arange(1, nb + 1))[None, :, None],
            axis=2)                                               # [B, nb]
        has_slot = jnp.take_along_axis(beam_rank, slot_idx, axis=1) <= nb
        new_scores = jnp.take_along_axis(next_scores, slot_idx, axis=1)
        new_words = jnp.take_along_axis(word_id, slot_idx, axis=1)
        new_beams = jnp.take_along_axis(beam_id, slot_idx, axis=1)
        # unfilled slots / done sentences → (0, pad=eos, beam 0)
        pad_slot = jnp.logical_not(has_slot) | done[:, None]
        new_scores = jnp.where(pad_slot, 0.0, new_scores)
        new_words = jnp.where(pad_slot, eos, new_words)
        new_beams = jnp.where(pad_slot, 0, new_beams)

        rows = (jnp.arange(b)[:, None] * nb + new_beams).reshape(-1)
        input_ids = input_ids[rows]
        input_ids = jax.lax.dynamic_update_slice_in_dim(
            input_ids, new_words.reshape(-1)[:, None], cur_len, axis=1)
        caches = _gather_cache(caches, rows)
        beam_scores = new_scores.reshape(-1)

        return (input_ids, cur_len + 1, beam_scores, done, hyp_best, hyp_seq,
                hyp_len, hyp_count, caches, logits_buf)

    def cond_fn(state):
        _, cur_len, _, done, *_ = state
        return (cur_len < max_steps) & jnp.logical_not(jnp.all(done))

    state = (input_ids, jnp.int32(valid_len), beam_scores, done, hyp_best,
             hyp_seq, hyp_len, hyp_count, caches, logits_buf)
    (input_ids, cur_len, beam_scores, done, hyp_best, hyp_seq, hyp_len,
     hyp_count, caches, logits_buf) = jax.lax.while_loop(cond_fn, step_fn,
                                                         state)

    # decode best hypotheses: pad=eos, hyp written, eos terminator at len
    pos = jnp.arange(max_steps)[None, :]
    decoded = jnp.where(pos < hyp_len[:, None], hyp_seq,
                        jnp.full_like(hyp_seq, eos))
    decoded = jnp.where(pos == hyp_len[:, None], eos, decoded)

    logits = logits_buf.reshape(max_steps - 1, b, nb, vocab)
    return TeacherBeamOutput(predictions=decoded, logprobs=hyp_best,
                             logits=logits, num_steps=cur_len - 1)


def teacher_generate(model, variables, frames: jnp.ndarray, tokenizer, *,
                     beam_size: int = 4, max_steps: int = 15,
                     length_penalty: float = 0.6):
    """High-level teacher generation (reference
    ``GenerativeImageTextTeacher.forward``, model.py:762-793): beam-search
    captions plus the beam-consensus full-vocab logit rows per generated
    word. Returns a list of per-sample dicts with 'predictions', 'cap' and
    'output' keys like the reference — but computed as ONE batched XLA
    program instead of a per-sample Python loop with host syncs."""
    import numpy as np

    out = teacher_beam(model, variables, frames, beam_size=beam_size,
                       max_steps=max_steps, length_penalty=length_penalty)
    preds = np.asarray(out.predictions)
    caps = [tokenizer.decode(p, skip_special_tokens=True) for p in preds]
    n_words = jnp.asarray([min(len(c.split(" ")), int(out.num_steps))
                           for c in caps], jnp.int32)
    teacher_logits, valid = teacher_kd_targets(out, n_words)
    results = []
    for i, cap in enumerate(caps):
        n = int(n_words[i])
        results.append({
            "predictions": preds[i],
            "cap": cap,
            "output": jnp.asarray(teacher_logits[i, :n])[None],
            "logprobs": float(out.logprobs[i]),
        })
    return results


def teacher_kd_targets(out: TeacherBeamOutput, captions_text_len: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-consensus teacher distributions (reference model.py:762-793).

    For each generated word position, pick the beam whose logit at that
    word's token id is largest and take that beam's full-vocab logits as the
    teacher distribution. Returns (teacher_logits [B, S, V],
    valid [B, S] mask) where S = max generated steps.
    """
    steps, b, nb, vocab = out.logits.shape
    # word tokens at positions 1..steps (predictions[:, 1:steps+1])
    words = out.predictions[:, 1:steps + 1]                    # [B, S]
    step_logits = out.logits.transpose(1, 0, 2, 3)             # [B, S, nb, V]
    word_logit = jnp.take_along_axis(
        step_logits, words[:, :, None, None].astype(jnp.int32), axis=3
    )[..., 0]                                                  # [B, S, nb]
    best_beam = jnp.argmax(word_logit, axis=-1)                # [B, S]
    teacher = jnp.take_along_axis(
        step_logits, best_beam[:, :, None, None], axis=2)[:, :, 0]
    n = jnp.minimum(captions_text_len, steps)                  # [B]
    valid = jnp.arange(steps)[None, :] < n[:, None]
    return teacher, valid
