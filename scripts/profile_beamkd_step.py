"""Full-size beam-KD distillation train step timing (loss 5 `ce_teacher`
+ beam-consensus KD — the reference's `teacher.forward` KD-target path,
model.py:762-793, run IN-GRAPH: teacher beam + student fwd/bwd + Adam as
one jitted program). PARITY.md previously recorded only "compiles in
99 s, finite losses"; this pins the step time, post the hierarchical
in-loop top-k rewrite (docs/PERF.md §5b).

Usage: python scripts/profile_beamkd_step.py [batch] [reps]
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
    from rtvc_tpu.config import cfg as app_cfg
    from rtvc_tpu.distill import LossWeights
    from rtvc_tpu.models.git_teacher import teacher_from_config
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.train import create_train_state, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    t_len = 40

    teacher = teacher_from_config(app_cfg)
    student = student_from_config(app_cfg)
    frames = jnp.zeros((batch, 6, 224, 224, 3), jnp.float32)
    caps = jnp.zeros((batch, t_len), jnp.int32)
    print(f"backend={jax.default_backend()} batch={batch} reps={reps}",
          flush=True)

    t0 = time.perf_counter()
    tvars = jax.jit(teacher.init)(jax.random.PRNGKey(0), frames[:1], caps[:1])
    jax.block_until_ready(tvars)
    print(f"teacher init: {time.perf_counter() - t0:.1f}s", flush=True)

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    t0 = time.perf_counter()
    state = create_train_state(student, jax.random.PRNGKey(1),
                               {"frames": frames, "caption": caps}, tx)
    jax.block_until_ready(state.params)
    print(f"student init: {time.perf_counter() - t0:.1f}s", flush=True)

    weights = LossWeights(ce_teacher=1.0, kd_source="beam_consensus")
    step = make_train_step(student, teacher, tx, weights=weights,
                           donate=False)
    step_rng = jax.random.PRNGKey(2)

    rng = np.random.default_rng(0)
    caps_np = rng.integers(1, 30000, size=(batch, t_len)).astype(np.int32)
    caps_np[:, 0] = 101
    inputs = [{"frames": jnp.asarray(rng.normal(size=frames.shape),
                                     jnp.float32),
               "caption": jnp.asarray(caps_np)} for _ in range(reps)]

    t0 = time.perf_counter()
    _, m = step(state, tvars, inputs[0], step_rng)
    m = {k: float(v) for k, v in m.items()}
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s; "
          f"metrics {m}", flush=True)

    # pipelined wall: distinct inputs, tiny fetch per rep
    t0 = time.perf_counter()
    outs = [step(state, tvars, b, step_rng) for b in inputs]
    for _, mm in outs:
        np.asarray(mm["total"])
    wall = (time.perf_counter() - t0) / reps * 1e3
    print(f"beam-KD train step wall (pipelined): {wall:8.1f} ms "
          f"({batch / wall * 1e3:.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
