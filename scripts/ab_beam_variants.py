"""Structural A/B of the student beam-search decode loop.

profile_caption_step measured beam-3 at ~5.6x the greedy caption step
while ab_beam_step showed every identified per-step op is trivial
(log_softmax 0.04 ms, top_k ~0, full cache gather 0.45 ms) — so the
cost must be structural. This script scan-times the DECODE LOOP ONLY
(memory precomputed) under variants:

  base        exact copy of decode.student_beam's loop
  no_lsm      top_k on raw logits, normalize only the k winners with
              logsumexp (exact: log_softmax is a per-row monotone shift)
  self_gather gather only the self-attn k/v cache rows; mem_k/mem_v are
              replicated per beam so within-sample reordering is a
              value-identity on them (exact)
  both        no_lsm + self_gather
  no_gather   skip ALL cache gathers (WRONG results — attribution only)
  no_decode   skip the decode_step (WRONG — attribution only)

Usage: python scripts/ab_beam_variants.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.config import cfg
    from rtvc_tpu.models.student import student_from_config

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    b, k, max_len = 8, 3, 25
    total = max_len

    model = student_from_config(cfg)
    f0 = jnp.zeros((1, 6, 224, 224, 3), jnp.float32)
    y0 = jnp.array([[model.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), f0, y0)
    jax.block_until_ready(variables)
    print(f"backend={jax.default_backend()} reps={reps} b={b} k={k} "
          f"max_len={max_len}", flush=True)

    rng = np.random.default_rng(0)
    # real memory shape: 6 frame tokens, d_model
    memory0 = jnp.asarray(rng.normal(size=(b, 6, model.d_model)), jnp.float32)

    def beam_from_memory(vv, memory, *, lsm_full=True, gather_mem=True,
                         gather_any=True, run_decode=True):
        caches = model.apply(vv, b, total, memory,
                             method=lambda m, b_, t_, mm: m.init_cache(b_, t_, mm))
        cls = jnp.full((b,), model.cls_token_id, jnp.int32)
        logits0, caches = model.apply(
            vv, cls, jnp.int32(0), caches, None,
            method=lambda m, t_, i_, c_, m_: m.decode_step(t_, i_, c_, m_))
        logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32), axis=-1)
        scores, top_idx = jax.lax.top_k(logp0, k)
        seqs = jnp.zeros((b, k, total), jnp.int32)
        seqs = seqs.at[:, :, 0].set(model.cls_token_id)
        seqs = seqs.at[:, :, 1].set(top_idx)
        rep = jnp.repeat(jnp.arange(b), k)
        caches = jax.tree.map(lambda a: a[rep], caches)

        def gather(c, rows):
            if not gather_any:
                return c
            if gather_mem:
                return jax.tree.map(lambda a: a[rows], c)
            out = []
            for layer in c:
                d = dict(layer)
                d["k"] = layer["k"][rows]
                d["v"] = layer["v"][rows]
                out.append(d)
            return out

        def step_fn(step, state):
            seqs, scores, caches = state
            last = seqs[:, :, step - 1].reshape(b * k)
            if run_decode:
                logits, new_caches = model.apply(
                    vv, last, step - 1, caches, None,
                    method=lambda m, t_, i_, c_, m_: m.decode_step(
                        t_, i_, c_, m_))
            else:
                logits = (last[:, None] + jnp.zeros((b * k, model.vocab_size),
                                                    jnp.float32))
                new_caches = caches
            if lsm_full == "2d":
                # attribution arm: full log_softmax kept, but top_k on the
                # 2-D [b*k, V] layout — separates the softmax cost from the
                # 3-D top_k cost
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                top_scores, top_words = jax.lax.top_k(logp, k)
                top_scores = top_scores.reshape(b, k, k)
                top_words = top_words.reshape(b, k, k)
            elif lsm_full:
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                logp = logp.reshape(b, k, -1)
                top_scores, top_words = jax.lax.top_k(logp, k)
            else:
                raw = logits.astype(jnp.float32)
                top_raw, top_words = jax.lax.top_k(raw, k)     # [b*k, k]
                lse = jax.nn.logsumexp(raw, axis=-1, keepdims=True)
                top_scores = (top_raw - lse).reshape(b, k, k)
                top_words = top_words.reshape(b, k, k)
            cand_scores = (scores[:, :, None] + top_scores).reshape(b, k * k)
            cand_words = top_words.reshape(b, k * k)
            cand_beams = jnp.repeat(jnp.arange(k), k)[None, :]
            best_scores, best_idx = jax.lax.top_k(cand_scores, k)
            sel_beams = jnp.take_along_axis(
                jnp.broadcast_to(cand_beams, (b, k * k)), best_idx, axis=1)
            sel_words = jnp.take_along_axis(cand_words, best_idx, axis=1)
            new_seqs = jnp.take_along_axis(seqs, sel_beams[:, :, None], axis=1)
            new_seqs = jax.lax.dynamic_update_slice_in_dim(
                new_seqs, sel_words[:, :, None], step, axis=2)
            rows = (jnp.arange(b)[:, None] * k + sel_beams).reshape(-1)
            new_caches = gather(new_caches, rows)
            return new_seqs, best_scores, new_caches

        seqs, scores, _ = jax.lax.fori_loop(2, max_len, step_fn,
                                            (seqs, scores, caches))
        best = jnp.argmax(scores, axis=-1)
        return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]

    def scan_time(fn, x):
        def run(n):
            def scanned(vv, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = fn(vv, first)
                    s = jnp.sum(o.astype(jnp.float32))[None]
                    return s * 1e-12, ()
                return jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(variables, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(variables, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    arms = [
        ("base (decode-only loop)", dict()),
        ("no_lsm (topk raw + lse winners)", dict(lsm_full=False)),
        ("lsm_2d (full lsm, 2-D topk)", dict(lsm_full="2d")),
        ("self_gather (skip mem k/v)", dict(gather_mem=False)),
        ("both", dict(lsm_full=False, gather_mem=False)),
        ("no_gather (ATTRIBUTION ONLY)", dict(gather_any=False)),
        ("no_decode (ATTRIBUTION ONLY)", dict(run_decode=False)),
    ]
    outs = {}
    for name, kw in arms:
        fn = lambda vv, x, kw=kw: beam_from_memory(vv, x, **kw)
        ms = scan_time(fn, memory0)
        outs[name] = np.asarray(jax.jit(
            lambda vv, x, kw=kw: beam_from_memory(vv, x, **kw)
        )(variables, memory0))
        print(f"{name:36s} {ms:8.3f} ms", flush=True)

    ref = outs["base (decode-only loop)"]
    for name in ("no_lsm (topk raw + lse winners)", "lsm_2d (full lsm, 2-D topk)",
                 "self_gather (skip mem k/v)", "both"):
        eq = np.array_equal(outs[name], ref)
        print(f"tokens equal vs base: {name:36s} {eq}", flush=True)


if __name__ == "__main__":
    main()
