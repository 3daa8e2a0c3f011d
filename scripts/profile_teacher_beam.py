"""Full-size teacher beam search timing (the KD-target generation path,
reference model.py:762-793) — pins the PARITY.md "warm teacher_beam"
number and measures the hierarchical in-loop top-k rewrite (decode.py:
per-row top-k on raw penalized logits + logsumexp on the winners, pooled;
replaces log_softmax over [B*nb, 30522] + top_k over [B, nb*30522]).

Usage: python scripts/profile_teacher_beam.py [batch] [reps]
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
    from rtvc_tpu.models.clip_vit import clip_vit_l14_config
    from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    cfg = GITConfig(dtype=jnp.bfloat16,
                    clip=clip_vit_l14_config(dtype=jnp.bfloat16))
    teacher = GITTeacher(cfg)
    frames = jnp.zeros((batch, 6, 224, 224, 3), jnp.float32)
    caps = jnp.zeros((batch, 40), jnp.int32)
    print(f"backend={jax.default_backend()} batch={batch} reps={reps}",
          flush=True)

    t0 = time.perf_counter()
    tvars = jax.jit(teacher.init)(jax.random.PRNGKey(0), frames[:1], caps[:1])
    jax.block_until_ready(tvars)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    frame_inputs = [jnp.asarray(rng.normal(size=frames.shape), jnp.float32)
                    for _ in range(reps)]

    def beam(tv, f):
        return decode_lib.teacher_beam(teacher, tv, f, beam_size=4,
                                       max_steps=15)

    # pipelined wall (distinct inputs, tiny fetch per rep)
    beam_jit = jax.jit(beam)
    out = beam_jit(tvars, frame_inputs[0])
    np.asarray(out.predictions)
    t0 = time.perf_counter()
    outs = [beam_jit(tvars, f) for f in frame_inputs]
    for o in outs:
        np.asarray(o.predictions)
    wall = (time.perf_counter() - t0) / reps * 1e3
    print(f"teacher_beam wall (pipelined): {wall:8.2f} ms", flush=True)

    # scan-isolated device time
    def scan_time(n):
        def f_impl(tv, x):
            def body(carry, _):
                o = beam(tv, x + carry.astype(x.dtype))
                s = (jnp.sum(o.logits) * 1e-12
                     + jnp.sum(o.predictions).astype(jnp.float32)
                     + jnp.sum(o.logprobs))
                return s[None] * 1e-12, ()
            return jax.lax.scan(body, jnp.zeros((1,), jnp.float32),
                                None, length=n)[0]
        f = jax.jit(f_impl)
        np.asarray(f(tvars, frame_inputs[0]))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(tvars, frame_inputs[0]))
        return (time.perf_counter() - t0) / 3

    n = max(4, reps)
    dev = (scan_time(1 + n) - scan_time(1)) / n * 1e3
    print(f"teacher_beam device (scan):    {dev:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
