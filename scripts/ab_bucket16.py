"""A/B: serving caption step at bucket 8 vs 16 vs 32 (VERDICT r4 #7).

Batch 16 bought +26%/clip on the replay TRAIN step after the encoder
levers (docs/PERF.md §1); the serving caption step shares the encoder
shapes, so the same economy may apply. Measures the EXACT serving
program (serving.make_caption_step — fused preprocess + TinyViT encode +
greedy KV-cache decode) scan-isolated at each bucket size and reports
device ms/step and windows/s. If 16 wins per-window, BatchCaptionServer's
``max_batch`` default should rise (buckets stay 1,2,4,8,16 so small
traffic still gets small programs).

Usage: python scripts/ab_bucket16.py [reps]
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
    from rtvc_tpu.serving import make_caption_step

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    student = student_from_config(cfg)
    init_frames = jnp.zeros((1, 6, 224, 224, 3), jnp.float32)
    init_caps = jnp.zeros((1, 40), jnp.int32)
    variables = jax.jit(student.init)(key, init_frames, init_caps)
    step = make_caption_step(student, max_len=25)

    def scan_time(batch):
        u8 = jnp.asarray(rng.integers(0, 255,
                                      size=(batch, 6, 224, 224, 3)),
                         jnp.uint8)

        def run(n):
            def scanned(v, xx):
                def body(carry, _):
                    # perturb one pixel tensor-wide via the carry so no
                    # iteration is loop-invariant (uint8 wraparound is fine)
                    first = xx + carry.astype(jnp.uint8)
                    toks = step(v, first)
                    s = jnp.sum(toks.astype(jnp.float32))[None]
                    return s % 251, ()
                return jax.lax.scan(
                    body, jnp.ones((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(variables, u8))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(variables, u8))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    base = None
    for batch in (8, 16, 32):
        ms = scan_time(batch)
        per = ms / batch
        if batch == 8:
            base = per
        print(f"bucket {batch:2d}: {ms:8.2f} ms/step  {per:6.3f} ms/window "
              f"({batch / ms * 1e3:7.1f} windows/s, "
              f"{base / per:.2f}x per-window vs bucket 8)", flush=True)


if __name__ == "__main__":
    main()
