"""A/B: full-size distillation train step with the int8 W8A8 teacher
(ROADMAP #8 / VERDICT r2 weak #4) — the end-to-end verdict for
``cfg.tpu.quantize_teacher``.

Measures the complete jitted train step (teacher fwd + student fwd/bwd +
Adam) at batch 8 x 6 frames x 224px, float teacher vs quantized teacher,
with the loop-experienced wall method (distinct inputs per rep + per-rep
tiny fetch — scan-isolating a 150+ ms program is unnecessary; the ~30 ms
fetch RTT floor affects both arms equally).

Usage: python scripts/ab_int8_step.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.config import cfg
    from rtvc_tpu.models.git_teacher import (quantize_teacher_variables,
                                             teacher_from_config)
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.train import create_train_state, make_train_step

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def batch(seed):
        r = np.random.default_rng(seed)
        frames = r.normal(size=(8, 6, 224, 224, 3)).astype(np.float32)
        caps = np.zeros((8, 40), np.int32)
        caps[:, 0] = 101
        for i in range(8):
            n = int(r.integers(5, 15))
            caps[i, 1:n] = r.integers(999, 29000, size=n - 1)
        return {"frames": jnp.asarray(frames), "caption": jnp.asarray(caps)}

    student = student_from_config(cfg)
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    example = batch(0)
    t0 = time.perf_counter()
    state = create_train_state(student, jax.random.PRNGKey(0), example, tx)
    print(f"student init {time.perf_counter() - t0:.1f}s", flush=True)

    batches = [batch(s) for s in range(reps + 2)]

    def measure(tag, quantized):
        import dataclasses
        c = cfg.replace(
            tpu=dataclasses.replace(cfg.tpu, quantize_teacher=quantized))
        teacher = teacher_from_config(c)
        t0 = time.perf_counter()
        # float init either way; quantize the variables for the int8 arm
        fteacher = teacher_from_config(cfg)
        tvars = jax.jit(fteacher.init)(jax.random.PRNGKey(1),
                                       example["frames"][:1],
                                       example["caption"][:1])
        if quantized:
            tvars = quantize_teacher_variables(jax.tree.map(np.asarray, tvars))
            tvars = jax.device_put(tvars)
        print(f"  teacher init {time.perf_counter() - t0:.1f}s", flush=True)
        step = make_train_step(student, teacher, tx, donate=False)
        key = jax.random.PRNGKey(2)
        st = state
        t0 = time.perf_counter()
        st, m = step(st, tvars, batches[0], key)
        loss0 = float(m["total"])
        print(f"  compile+first {time.perf_counter() - t0:.1f}s "
              f"loss {loss0:.3f}", flush=True)
        times = []
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            st, m = step(st, tvars, batches[i], key)
            _ = float(m["total"])  # per-rep fetch: loop-experienced wall
            times.append(time.perf_counter() - t0)
        ms = np.median(times) * 1e3
        print(f"{tag}: median step {ms:.1f} ms wall (p90 "
              f"{np.percentile(times, 90) * 1e3:.1f} ms), loss {loss0:.4f}",
              flush=True)
        return ms

    from rtvc_tpu.ops import quantization as Q

    f_ms = measure("float teacher ", quantized=False)
    q_ms = measure("int8-xla  teacher ", quantized=True)
    Q.set_pallas_int8(True)
    try:
        p_ms = measure("int8-pallas teacher ", quantized=True)
    finally:
        Q.set_pallas_int8(False)
    print(f"int8-xla step / float step    = {q_ms / f_ms:.3f}x", flush=True)
    print(f"int8-pallas step / float step = {p_ms / f_ms:.3f}x", flush=True)


if __name__ == "__main__":
    main()
