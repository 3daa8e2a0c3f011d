"""Attribute the beam-step overhead (profile_caption_step: beam-3 = 5.6x
greedy at batch 8) and A/B exact top-k strategies over the 30522-way
logits: lax.top_k (sort-based on TPU) vs k iterative argmax passes
(VPU reductions, exact, same lowest-index tie rule).

Usage: python scripts/ab_beam_step.py [reps]
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
    from rtvc_tpu import decode as decode_lib
    from rtvc_tpu.config import cfg
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.ops.preprocess import clip_preprocess

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    b, k, v = 8, 3, 30522
    rows = b * k

    model = student_from_config(cfg)
    f0 = jnp.zeros((1, 6, 224, 224, 3), jnp.float32)
    y0 = jnp.array([[model.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), f0, y0)
    jax.block_until_ready(variables)
    print(f"backend={jax.default_backend()} reps={reps} rows={rows} V={v}",
          flush=True)

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(rows, v)), jnp.float32)

    def scan_time(apply, x, vs=None):
        vs = variables if vs is None else vs

        def run(n):
            def scanned(vv, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = apply(vv, first)
                    s = sum(jnp.sum(leaf.astype(jnp.float32))
                            for leaf in jax.tree.leaves(o))[None]
                    return s * 1e-12, ()
                return jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(vs, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(vs, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    def row(name, ms, note=""):
        print(f"{name:44s} {ms:8.3f} ms  {note}", flush=True)

    # candidate per-step ops at the beam shape
    row("log_softmax [24,30522]",
        scan_time(lambda _, x: jax.nn.log_softmax(x, axis=-1), logits))
    row("lax.top_k k=3 of [24,30522]",
        scan_time(lambda _, x: jax.lax.top_k(x, k), logits))

    def iter_topk(x, kk):
        vals, idxs = [], []
        for _ in range(kk):
            i = jnp.argmax(x, axis=-1)
            val = jnp.take_along_axis(x, i[:, None], axis=-1)[:, 0]
            vals.append(val)
            idxs.append(i)
            x = x.at[jnp.arange(x.shape[0]), i].set(-jnp.inf)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1)

    row("iterative argmax x3 of [24,30522]",
        scan_time(lambda _, x: iter_topk(x, k), logits))

    # equality including tie order (integer-valued logits force ties)
    ties = jnp.asarray(rng.integers(0, 4, size=(rows, v)), jnp.float32)
    for probe in (logits, ties):
        tv, ti = jax.lax.top_k(probe, k)
        iv, ii = iter_topk(probe, k)
        assert np.array_equal(np.asarray(ti), np.asarray(ii)), "idx mismatch"
        assert np.allclose(np.asarray(tv), np.asarray(iv)), "val mismatch"
    print("iterative == lax.top_k (incl. tie order): OK", flush=True)

    # cache gather cost at the beam layout
    total = 25
    mem = jnp.asarray(rng.normal(size=(rows, 294, 576)), jnp.bfloat16)
    caches = model.apply(variables, rows, total, mem,
                         method=lambda m, b_, t_, mm: m.init_cache(b_, t_, mm))

    def gather(_, x):
        rws = (jnp.arange(rows) + x[0, 0].astype(jnp.int32)) % rows
        return decode_lib._gather_cache(caches, rws)
    row("cache gather (24 rows, all leaves)",
        scan_time(gather, jnp.zeros((1, 1), jnp.float32)))

    # one full beam decode_step body for reference
    proc = jnp.asarray(rng.normal(scale=0.5, size=(b, 6, 224, 224, 3)),
                       jnp.float32)

    def beam_full(vv, x):
        return decode_lib.student_beam(model, vv, x, max_len=25, k=k)
    row("FULL student_beam max_len=25 (current)", scan_time(beam_full, proc))


if __name__ == "__main__":
    main()
