"""A/B: full-size beam-KD train step, live teacher beam vs TeacherBeamCache
replay (VERDICT r3 #1). The live step runs the 4-beam teacher search
in-graph every step (reference model.py:762-793; 465.5 ms/step at batch 8,
docs/PERF.md §1); the replay step feeds the cached beam predictions +
beam-consensus logits as batch arrays instead, so the teacher leaves the
program entirely — epoch 2+ of a loss-5 run should pay student-only cost.

Usage: python scripts/ab_beam_replay_step.py [batch] [reps]
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
    max_steps = 15
    vocab = app_cfg.teacher.vocab_size

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
    state = create_train_state(student, jax.random.PRNGKey(1),
                               {"frames": frames, "caption": caps}, tx)
    jax.block_until_ready(state.params)

    weights = LossWeights(ce_teacher=1.0, kd_source="beam_consensus")
    step_rng = jax.random.PRNGKey(2)
    rng = np.random.default_rng(0)
    caps_np = rng.integers(1, 30000, size=(batch, t_len)).astype(np.int32)
    caps_np[:, 0] = 101

    def batches(replay):
        out = []
        for _ in range(reps):
            b = {"frames": jnp.asarray(rng.normal(size=frames.shape),
                                       jnp.float32),
                 "caption": jnp.asarray(caps_np)}
            if replay:
                # what CacheReplayFeed attaches on a hit: beam predictions
                # + full-vocab consensus rows, already on device. Live
                # beam output has max_steps+1 columns (BOS at column 0) —
                # mirror that so both timed programs see the same number
                # of decode steps.
                preds = rng.integers(
                    1000, 30000, size=(batch, max_steps + 1)).astype(np.int32)
                preds[:, 0] = 101  # BOS column, as the real cache stores it
                preds[:, 10:] = 102  # SEP tail like a real beam output
                b["teacher_beam_predictions"] = jnp.asarray(preds)
                b["teacher_kd_logits"] = jnp.asarray(
                    rng.normal(size=(batch, max_steps, vocab)), jnp.float32)
            out.append(b)
        return out

    def run(tag, step, inputs):
        t0 = time.perf_counter()
        _, m = step(state, tvars, inputs[0], step_rng)
        m = {k: float(v) for k, v in m.items()}
        print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s; "
              f"total={m['total']:.3f}", flush=True)
        t0 = time.perf_counter()
        outs = [step(state, tvars, b, step_rng) for b in inputs]
        for _, mm in outs:
            np.asarray(mm["total"])
        wall = (time.perf_counter() - t0) / reps * 1e3
        print(f"{tag}: step wall (pipelined) {wall:8.1f} ms "
              f"({batch / wall * 1e3:.1f} clips/s)", flush=True)
        return wall

    live = make_train_step(student, teacher, tx, weights=weights,
                           donate=False, kd_max_steps=max_steps)
    w_live = run("live beam ", live, batches(False))

    replay = make_train_step(student, teacher, tx, weights=weights,
                             donate=False, kd_max_steps=max_steps,
                             external_teacher_beam=True)
    w_rep = run("beam replay", replay, batches(True))
    print(f"replay speedup: {w_live / w_rep:.2f}x "
          f"({w_live:.1f} -> {w_rep:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
