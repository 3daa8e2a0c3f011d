"""Decode-loop parity tests: KV-cache loops vs naive full-recompute reference
semantics (the reference re-ran the whole decoder each step,
model.py:156-187 / 189-317)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu import decode
from rtvc_tpu.models.git_teacher import GITTeacher
from rtvc_tpu.models.student import StudentCandidateV1

from test_models import TINY_ENC, TINY_GIT, tiny_student


@pytest.fixture(scope="module")
def student_setup():
    model = tiny_student(dropout=0.0)
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64, 3))
    y = jnp.array([[101, 5, 6, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames[:1], y)
    return model, variables, frames


def _naive_greedy(model, variables, frames, max_len):
    """Reference greedy semantics: full forward_decoder re-run per step."""
    _, memory = model.apply(variables, frames,
                            method=lambda m, x: m.forward_image_enc(x))
    b = frames.shape[0]
    tgt = np.full((b, 1), model.cls_token_id, np.int32)
    for _ in range(max_len):
        logits = model.apply(variables, jnp.asarray(tgt), memory,
                             method=lambda m, y, mem: m.forward_decoder(y, mem))
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1), np.int32)
        tgt = np.concatenate([tgt, nxt[:, None]], axis=1)
        if np.all(nxt == model.sep_token_id):
            break
    return tgt


def _naive_beam(model, variables, frames, max_len, k):
    """Reference beam semantics (model.py:189-317), numpy implementation."""
    _, memory = model.apply(variables, frames,
                            method=lambda m, x: m.forward_image_enc(x))
    b = frames.shape[0]

    def dec(tgt):
        logits = model.apply(variables, jnp.asarray(tgt), memory,
                             method=lambda m, y, mem: m.forward_decoder(y, mem))
        return np.asarray(jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), axis=-1))

    tgt = np.full((b, 1), model.cls_token_id, np.int32)
    logp = dec(tgt)
    top_idx = np.argsort(-logp, axis=-1)[:, :k]
    scores = np.take_along_axis(logp, top_idx, axis=1)
    seqs = np.concatenate(
        [np.repeat(tgt[:, None], k, 1), top_idx[:, :, None]], axis=2)

    for step in range(2, max_len):
        cand = np.zeros((b, k * k, 3))
        for i in range(k):
            lp = dec(seqs[:, i])
            ti = np.argsort(-lp, axis=-1)[:, :k]
            ts = np.take_along_axis(lp, ti, axis=1)
            cand[:, i * k:(i + 1) * k, 0] = scores[:, i:i + 1] + ts
            cand[:, i * k:(i + 1) * k, 1] = i
            cand[:, i * k:(i + 1) * k, 2] = ti
        order = np.argsort(-cand[:, :, 0], axis=1, kind="stable")[:, :k]
        new_seqs = np.zeros((b, k, step + 1), np.int32)
        for bi in range(b):
            for idx in range(k):
                gi = order[bi, idx]
                beam = int(cand[bi, gi, 1])
                word = int(cand[bi, gi, 2])
                new_seqs[bi, idx, :-1] = seqs[bi, beam]
                new_seqs[bi, idx, -1] = word
                scores[bi, idx] = cand[bi, gi, 0]
        seqs = new_seqs
    best = scores.argmax(-1)
    return seqs[np.arange(b), best]


@pytest.mark.slow
def test_greedy_matches_naive(student_setup):
    model, variables, frames = student_setup
    max_len = 6
    fast = np.asarray(decode.student_greedy(model, variables, frames,
                                            max_len=max_len))
    ref = _naive_greedy(model, variables, frames, max_len)
    # fast output is fixed-width [B, 1+max_len] zero-padded
    assert fast.shape == (2, 1 + max_len)
    np.testing.assert_array_equal(fast[:, :ref.shape[1]], ref)
    assert np.all(fast[:, ref.shape[1]:] == 0)


def test_beam_matches_naive(student_setup):
    model, variables, frames = student_setup
    fast = np.asarray(decode.student_beam(model, variables, frames,
                                          max_len=6, k=3))
    ref = _naive_beam(model, variables, frames, max_len=6, k=3)
    np.testing.assert_array_equal(fast, ref)


def test_decode_step_matches_full_forward(student_setup):
    """Sequential KV-cache steps reproduce teacher-forced full-seq logits."""
    model, variables, frames = student_setup
    _, memory = model.apply(variables, frames,
                            method=lambda m, x: m.forward_image_enc(x))
    y = jnp.array([[101, 5, 6, 9], [101, 7, 3, 2]], jnp.int32)
    full = model.apply(variables, y, memory,
                       method=lambda m, y_, mem: m.forward_decoder(y_, mem))
    caches = model.apply(variables, 2, 4, memory,
                         method=lambda m, b, t, mem: m.init_cache(b, t, mem))
    step_logits = []
    for i in range(4):
        logits, caches = model.apply(
            variables, y[:, i], jnp.int32(i), caches, None,
            method=lambda m, t, i_, c, kv: m.decode_step(t, i_, c, kv))
        step_logits.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(step_logits, 1), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_teacher_beam_runs_and_shapes():
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 102, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames[:1], caps)
    out = decode.teacher_beam(model, variables, frames, beam_size=3,
                              max_steps=7)
    assert out.predictions.shape == (2, 7)
    assert out.logits.shape == (6, 2, 3, 211)
    assert np.all(np.asarray(out.predictions[:, 0]) == 101)  # starts with SOS
    # every row ends in at least one EOS/pad (102)
    assert np.all(np.any(np.asarray(out.predictions) == 102, axis=1))
    assert np.all(np.isfinite(np.asarray(out.logprobs)))


def test_teacher_kd_targets_shapes():
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 102, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames[:1], caps)
    out = decode.teacher_beam(model, variables, frames, beam_size=3,
                              max_steps=7)
    teacher, valid = decode.teacher_kd_targets(
        out, jnp.array([4, 2], jnp.int32))
    assert teacher.shape == (2, 6, 211)
    assert valid.shape == (2, 6)
    assert int(valid[0].sum()) == 4 and int(valid[1].sum()) == 2


def test_teacher_beam_prefers_likely_tokens():
    """Beam result should equal/beat greedy on total log-prob."""
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 102, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(5), frames, caps)
    out1 = decode.teacher_beam(model, variables, frames, beam_size=1,
                               max_steps=7)
    out4 = decode.teacher_beam(model, variables, frames, beam_size=4,
                               max_steps=7)
    assert float(out4.logprobs[0]) >= float(out1.logprobs[0]) - 1e-5


def test_teacher_beam_sampling_path():
    """do_sample=True (reference model.py:532-554): runs, differs across
    seeds, respects top_k filtering."""
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 102, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, caps)
    out_a = decode.teacher_beam(model, variables, frames, beam_size=2,
                                max_steps=6, do_sample=True, top_k=20,
                                temperature=1.5, rng=jax.random.PRNGKey(1))
    out_b = decode.teacher_beam(model, variables, frames, beam_size=2,
                                max_steps=6, do_sample=True, top_k=20,
                                temperature=1.5, rng=jax.random.PRNGKey(2))
    assert out_a.predictions.shape == (1, 6)
    assert np.all(np.asarray(out_a.predictions[:, 0]) == 101)
    # different seeds should (overwhelmingly) sample different sequences
    assert not np.array_equal(np.asarray(out_a.predictions),
                              np.asarray(out_b.predictions))


def test_top_k_top_p_filtering():
    logits = jnp.asarray(np.log([[0.5, 0.25, 0.15, 0.07, 0.03]]), jnp.float32)
    k2 = decode.top_k_top_p_filtering(logits, top_k=2)
    assert np.isfinite(np.asarray(k2[0, :2])).all()
    assert np.all(np.asarray(k2[0, 2:]) == -np.inf)
    p = decode.top_k_top_p_filtering(logits, top_p=0.6)
    # 0.5 + 0.25 > 0.6 after first two -> keep exactly the top two
    assert np.isfinite(np.asarray(p[0, :2])).all()
    assert np.all(np.asarray(p[0, 2:]) == -np.inf)


def test_teacher_generate_api():
    from rtvc_tpu.tokenization import BertWordPieceTokenizer
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(7), (2, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 102, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames[:1], caps)
    tok = BertWordPieceTokenizer()
    results = decode.teacher_generate(model, variables, frames, tok,
                                      beam_size=2, max_steps=6)
    assert len(results) == 2
    for r in results:
        assert set(r) >= {"predictions", "cap", "output", "logprobs"}
        assert r["output"].ndim == 3  # [1, n, V] like the reference


def test_teacher_decode_step_matches_full_forward():
    """Sequential teacher KV-cache steps == teacher-forced forward logits
    (the property teacher_beam's correctness rests on)."""
    model = GITTeacher(TINY_GIT)
    frames = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 28, 28, 3))
    caps = jnp.array([[101, 5, 7, 9], [101, 8, 3, 2]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, caps)

    full = model.apply(variables, frames, caps)  # [B, T, V]

    visual = model.apply(variables, frames,
                         method=lambda m, f: m.encode_only(f))
    prefix = visual.shape[1]
    caches = model.apply(variables, visual, 4,
                         method=lambda m, v, t: m.init_cache(v, t))
    step_logits = []
    for i in range(4):
        logits, caches = model.apply(
            variables, caps[:, i], jnp.int32(i), caches, prefix,
            method=lambda m, tok, idx, c, p: m.decode_step(tok, idx, c, p))
        step_logits.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(step_logits, 1), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_hierarchical_topk_matches_flat_selection():
    """The in-loop candidate selection both beam searches now use — per-row
    top-k on RAW logits + logsumexp on the winners, pooled hierarchically —
    must select the same (score, word, beam) triples, in the same order
    INCLUDING ties, as the flat ``top_k(log_softmax + score, nb*V)`` it
    replaced (scripts/ab_beam_variants.py measured the flat form at ~98% of
    beam-loop device time). Integer-valued logits force heavy ties."""
    rng = np.random.default_rng(3)
    b, nb, pnbs, vocab = 3, 4, 2, 50
    m = pnbs * nb
    for probe in (rng.normal(size=(b * nb, vocab)),
                  rng.integers(0, 3, size=(b * nb, vocab)).astype(np.float64)):
        scores_tok = jnp.asarray(probe, jnp.float32)
        beam_scores = jnp.asarray(
            rng.normal(size=(b * nb,)).round(1), jnp.float32)

        # flat reference (the pre-optimization formulation)
        logp = jax.nn.log_softmax(scores_tok, axis=-1)
        cand = (logp + beam_scores[:, None]).reshape(b, nb * vocab)
        ref_scores, ref_words = jax.lax.top_k(cand, m)
        ref_word = ref_words % vocab
        ref_beam = ref_words // vocab

        # hierarchical (decode.teacher_beam's in-loop form)
        top_raw, top_word = jax.lax.top_k(scores_tok, m)
        lse = jax.nn.logsumexp(scores_tok, axis=-1, keepdims=True)
        top_logp = top_raw - lse + beam_scores[:, None]
        pooled = top_logp.reshape(b, nb * m)
        pooled_words = top_word.reshape(b, nb * m)
        new_scores, pick = jax.lax.top_k(pooled, m)
        new_word = jnp.take_along_axis(pooled_words, pick, axis=1)
        new_beam = pick // m

        np.testing.assert_array_equal(np.asarray(new_word),
                                      np.asarray(ref_word))
        np.testing.assert_array_equal(np.asarray(new_beam),
                                      np.asarray(ref_beam))
        np.testing.assert_allclose(np.asarray(new_scores),
                                   np.asarray(ref_scores),
                                   rtol=1e-6, atol=1e-6)
