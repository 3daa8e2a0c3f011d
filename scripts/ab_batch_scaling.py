"""Batch scaling of the steady-state (cached-replay) train step.

Round 2 measured batch 32 at 4.35x the batch-8 step time (0.92x
throughput) and concluded the dp mesh axis, not batch size, is the
scaling lever. That measurement predates the 1b encoder levers
(tanh GELU + compute-dtype window softmax) which removed most of the
elementwise time the old scaling was made of — this re-measures the
replay-style step (student fwd/bwd + losses + Adam, teacher top-K pairs
densified in-graph) at batch 8/16/32.

Usage: python scripts/ab_batch_scaling.py [reps] [top_k]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(batch, reps, top_k, rng):
    import jax
    import jax.numpy as jnp
    import optax

    from rtvc_tpu.config import cfg as app_cfg
    from rtvc_tpu.models.git_teacher import teacher_from_config
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.train import create_train_state, make_train_step

    t_len = 40
    teacher = teacher_from_config(app_cfg)  # config only; no live teacher
    student = student_from_config(app_cfg)

    frames = jnp.zeros((batch, 6, 224, 224, 3), jnp.float32)
    caps_np = rng.integers(1, 30000, size=(batch, t_len)).astype(np.int32)
    caps_np[:, 0] = 101
    caps = jnp.asarray(caps_np)

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(student, jax.random.PRNGKey(1),
                               {"frames": frames, "caption": caps}, tx)
    jax.block_until_ready(state.params)
    step = make_train_step(student, teacher, tx, donate=False,
                           external_teacher_logits=True, cache_top_k=top_k)
    step_rng = jax.random.PRNGKey(2)

    # base tensors generated ONCE; per-rep distinctness (the tunnel dedups
    # identical dispatches) comes from a tiny on-device add — generating
    # fresh 29-115 MB normals on the single host core costs ~0.2-2 s per
    # input and would swamp the step being measured
    base_frames = jnp.asarray(rng.normal(size=frames.shape)
                              .astype(np.float32))
    base_vals = jnp.asarray(rng.normal(size=(batch, t_len, top_k))
                            .astype(np.float32))
    base_idx = jnp.asarray(rng.integers(0, 30522, size=(batch, t_len, top_k))
                           .astype(np.int32))
    perturb = jax.jit(lambda f, i: f + i * 1e-6)
    counter = [0]

    def make_input():
        counter[0] += 1
        return {
            "frames": perturb(base_frames, jnp.float32(counter[0])),
            "caption": caps,
            "teacher_topk_vals": base_vals,
            "teacher_topk_idx": base_idx,
        }

    first = make_input()
    t0 = time.perf_counter()
    _, m = step(state, None, first, step_rng)
    np.asarray(m["total"])
    print(f"  batch {batch}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)

    # pipelined wall with distinct inputs; keep only 2 staged inputs alive
    # at a time so device HBM holds the step's working set, not reps x
    # batch-32 frame tensors
    cur = make_input()
    prev_m = None
    t0 = time.perf_counter()
    for _ in range(reps):
        _, mm = step(state, None, cur, step_rng)
        cur = make_input()          # host work overlaps the device step
        if prev_m is not None:      # fetch step N-1 while step N runs
            np.asarray(prev_m["total"])
        prev_m = mm
    np.asarray(prev_m["total"])
    wall = (time.perf_counter() - t0) / reps * 1e3
    return wall


def main():
    import jax

    import rtvc_tpu  # noqa: F401

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f"backend={jax.default_backend()} reps={reps} top_k={top_k}",
          flush=True)

    rng = np.random.default_rng(0)
    base = None
    for batch in (8, 16, 32):
        try:
            wall = run_one(batch, reps, top_k, rng)
        except Exception as e:  # noqa: BLE001 — record OOMs per batch size
            print(f"replay step batch {batch:3d}: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}",
                  flush=True)
            continue
        rel = "" if base is None else f"  ({wall / base:.2f}x batch-8 time)"
        if base is None:
            base = wall
        print(f"replay step batch {batch:3d}: {wall:8.1f} ms "
              f"= {batch / wall * 1e3:6.1f} clips/s{rel}", flush=True)


if __name__ == "__main__":
    main()
