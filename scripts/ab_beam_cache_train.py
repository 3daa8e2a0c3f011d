"""Beam-KD cache through the REAL train() loop (the ab_cache_step.py
methodology applied to TeacherBeamCache): live in-graph beam epochs vs
miss epoch (beam + store) vs replay epochs, wall-clock, batch 8,
loss 5 + beam-consensus KD active (reference model.py:762-793).

scripts/ab_beam_replay_step.py measured the step functions in isolation
(465.3 -> 42.7 ms); this records the number the docs/PERF.md §3 table
quotes for the PRODUCTION path — prefetch thread, loop dispatch and all.

Usage: python scripts/ab_beam_cache_train.py [n_batches] [top_k]

top_k=0 (default) stores full-vocab consensus rows — on the tunneled
runtime their 14.6 MB/batch upload dominates the replay step (423.7 ms at
34 MB/s — exactly the link time); top_k=128 stores the (value, index)
pairs (~92 KB/batch) and rebuilds dense rows ON DEVICE, the same cure the
forced-logit cache uses (docs/PERF.md §3).
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache
    from rtvc_tpu.distill import LossWeights
    from rtvc_tpu.models.git_teacher import teacher_from_config
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.tokenization import BertWordPieceTokenizer
    from rtvc_tpu.train import train

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    print(f"backend={jax.default_backend()} n_batches={n_batches} "
          f"top_k={top_k}", flush=True)

    def batch(seed):
        r = np.random.default_rng(seed)
        frames = r.normal(size=(8, 6, 224, 224, 3)).astype(np.float32)
        caps = np.zeros((8, 40), np.int32)
        caps[:, 0] = 101
        for i in range(8):
            n = int(r.integers(5, 15))
            caps[i, 1:n] = r.integers(999, 29000, size=n - 1)
        return {"frames": jnp.asarray(frames), "caption": jnp.asarray(caps),
                "vid-id": [f"v{seed}_{i}" for i in range(8)],
                "caption-id": [seed * 100 + i for i in range(8)]}

    loader = [batch(s) for s in range(n_batches)]
    tmp = tempfile.mkdtemp(prefix="rtvc_beam_ab_")
    tok = BertWordPieceTokenizer()
    config = from_dict({
        "logger": {"save_dir": os.path.join(tmp, "runs")},
        "train": {"batch_size": 8,
                  "trainer": {"max_epochs": 1,
                              "enable_checkpointing": False}},
        "teacher": {"beam_size": 4, "max_steps": 15},
        "wandb": {"mode": "disabled"},
    })
    weights = LossWeights(ce_teacher=1.0, kd_source="beam_consensus")
    student = student_from_config(config)
    teacher = teacher_from_config(config)

    t0 = time.perf_counter()
    _, live = train(config, loader, [], [], tok, run_name="live",
                    student=student, teacher=teacher, max_epochs=2,
                    use_orbax=False, loss_weights=weights)
    print(f"live arm total {time.perf_counter() - t0:.1f}s "
          f"epoch_step_ms={live['epoch_step_ms']}", flush=True)

    cache = TeacherBeamCache(os.path.join(tmp, "bcache"), beam_size=4,
                             max_steps=15, length_penalty=0.6, top_k=top_k)
    t0 = time.perf_counter()
    _, rep = train(config, loader, [], [], tok, run_name="cached",
                   student=student, teacher=teacher, max_epochs=3,
                   use_orbax=False, loss_weights=weights,
                   teacher_beam_cache=cache)
    print(f"cache arm total {time.perf_counter() - t0:.1f}s "
          f"epoch_step_ms={rep['epoch_step_ms']} "
          f"stats={rep['teacher_beam_cache']}", flush=True)

    live_ms = live["epoch_step_ms"][1]      # steady state (epoch 2)
    miss = rep["epoch_step_ms"][0]          # includes compile
    replay = min(rep["epoch_step_ms"][1:])
    print(f"\nlive beam step:      {live_ms:8.1f} ms wall")
    print(f"miss epoch step:     {miss:8.1f} ms wall (beam + store)")
    print(f"replay epoch step:   {replay:8.1f} ms wall  "
          f"({live_ms / replay:.2f}x vs live)")
    # loss equality live-vs-replay run (same weights init per config.seed)
    print(f"loss parity (live vs cached, per epoch): "
          f"{live['train_loss']} vs {rep['train_loss'][:2]}")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
