"""A/B: weight-only int8 vocab projection (vocab_w8) through the FULL
caption program — the bench.py headline (b=1) and the serving bucket-8
step — plus the token-flip rate quantization introduces on this weight
set. Methodology: §4 scan-delta (docs/PERF.md), same harness as
scripts/profile_caption_step.py.

Premise (docs/PERF.md §5 round-5 addendum): the greedy decode loop's
50 us/token IS the vocab projection's 35 MB bf16 weight read; the Pallas
weight-only kernel (ops/int8_gemm.w8_matmul) halves the bytes — 1.70x on
the isolated GEMV+argmax. This script prices the win in the shipped
programs.

Usage: python scripts/ab_w8_vocab.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401  (compile cache, offline env)
    from rtvc_tpu import decode as decode_lib
    from rtvc_tpu.config import cfg
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.ops.preprocess import clip_preprocess
    from rtvc_tpu.ops.quantization import quantize_vocab_head

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    window, max_len = 6, 25

    model = student_from_config(cfg)
    frames0 = jnp.zeros((1, window, 224, 224, 3), jnp.float32)
    y0 = jnp.array([[model.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), frames0, y0)
    jax.block_until_ready(variables)
    pack = jax.jit(quantize_vocab_head)(variables)
    jax.block_until_ready(pack)
    print(f"backend={jax.default_backend()} reps={reps} max_len={max_len}",
          flush=True)

    rng = np.random.default_rng(0)

    def scan_time(apply, x):
        def run(n):
            def scanned(v, vw, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = apply(v, vw, first)
                    s = jnp.sum(o.astype(jnp.float32))[None]
                    return s * 1e-12, ()
                return jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(variables, pack, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(variables, pack, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    def full(batch, w8):
        def step(v, vw, x):
            flat = x.reshape((batch * window,) + x.shape[2:])
            p = clip_preprocess(flat).reshape((batch, window) + x.shape[2:])
            return decode_lib.student_greedy(
                model, v, p, max_len=max_len, vocab_w8=vw if w8 else None)
        return step

    for batch in (1, 8):
        u8 = jnp.asarray(rng.integers(0, 255,
                                      size=(batch, window, 224, 224, 3)),
                         jnp.uint8)
        ms_bf = scan_time(full(batch, False), u8)
        ms_w8 = scan_time(full(batch, True), u8)
        print(f"b={batch}: caption step bf16 {ms_bf:7.3f} ms, w8-vocab "
              f"{ms_w8:7.3f} ms ({ms_bf / ms_w8:.2f}x; "
              f"{18.0 * batch / ms_w8 * 1e3:.0f} source fps)", flush=True)

    # token-flip rate on random weights: same 16 windows, both programs
    u8s = jnp.asarray(rng.integers(0, 255, size=(16, 1, window, 224, 224, 3)),
                      jnp.uint8)
    bf = jax.jit(full(1, False))
    w8 = jax.jit(full(1, True))
    flips = total = 0
    for i in range(16):
        a = np.asarray(bf(variables, pack, u8s[i]))
        b = np.asarray(w8(variables, pack, u8s[i]))
        flips += int((a != b).sum())
        total += a.size
    print(f"token flips vs bf16: {flips}/{total} "
          f"({flips / total * 100:.2f}% — random weights; quantization "
          f"moves logits ~4e-3 relative)", flush=True)


if __name__ == "__main__":
    main()
