"""Measure the steady-state teacher-cache replay step vs the live-teacher
step, wall-clock, through the REAL train() loop (VERDICT r2 next-round #1).

Round 2's replay path was synchronous (disk read + densify dispatch +
upload between steps) and LOST wall-clock to the live teacher (238-260 ms
vs 161 ms at batch 8) despite a 2.5x device-time win. Round 3 moves the
densify into the jitted step and prefetches cache reads + uploads on a
producer thread (data/teacher_cache.py CacheReplayFeed). This script
records the numbers that go into docs/PERF.md §3:

- live:   train() 1 epoch, no cache           -> avg step wall
- miss:   train() epoch 1 with top-K cache    -> avg step wall (computes + stores)
- replay: train() epochs 2-3 with the cache   -> avg step wall (the feature)

Usage: python scripts/ab_cache_step.py [n_batches] [top_k]
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
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache
    from rtvc_tpu.models.git_teacher import teacher_from_config
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.tokenization import BertWordPieceTokenizer
    from rtvc_tpu.train import train

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 128
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
    tmp = tempfile.mkdtemp(prefix="rtvc_cache_ab_")
    tok = BertWordPieceTokenizer()

    config = from_dict({
        "logger": {"save_dir": os.path.join(tmp, "runs")},
        "train": {"batch_size": 8,
                  "teacher_cache_top_k": top_k,
                  "trainer": {"max_epochs": 1,
                              "enable_checkpointing": False}},
        "wandb": {"mode": "disabled"},
    })
    student = student_from_config(config)
    teacher = teacher_from_config(config)
    tvars = None  # train() inits (seeded) — shared weights across arms? no:
    # each train() call re-inits identically from config.seed, so arms match.

    # 2 epochs: epoch 1 carries the one-time jit compile, epoch 2 is the
    # steady-state live-teacher step (the SMOKE_E2E table conflated these)
    t0 = time.perf_counter()
    _, live_hist = train(config, loader, [], [], tok, run_name="live",
                         student=student, teacher=teacher, max_epochs=2,
                         use_orbax=False)
    print(f"live arm total {time.perf_counter() - t0:.1f}s "
          f"epoch_step_ms={live_hist['epoch_step_ms']}", flush=True)
    print(f"  dispatch_ms={live_hist['epoch_dispatch_ms']} "
          f"fetch_s={live_hist['epoch_fetch_s']}", flush=True)

    cache = TeacherLogitsCache(os.path.join(tmp, "cache"), top_k=top_k)
    t0 = time.perf_counter()
    _, cache_hist = train(config, loader, [], [], tok, run_name="cached",
                          student=student, teacher=teacher, max_epochs=3,
                          use_orbax=False, teacher_cache=cache)
    print(f"cache arm total {time.perf_counter() - t0:.1f}s "
          f"epoch_step_ms={cache_hist['epoch_step_ms']} "
          f"stats={cache_hist['teacher_cache']}", flush=True)
    print(f"  dispatch_ms={cache_hist['epoch_dispatch_ms']} "
          f"fetch_s={cache_hist['epoch_fetch_s']}", flush=True)

    # arm 3: replay with host-loop -> device-loop grouping (the cache is
    # fully warm now, so every epoch is pure replay)
    spd = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    config_spd = from_dict({"tpu": {"steps_per_dispatch": spd}}, base=config)
    t0 = time.perf_counter()
    _, spd_hist = train(config_spd, loader, [], [], tok,
                        run_name="cached_spd", student=student,
                        teacher=teacher, max_epochs=2, use_orbax=False,
                        teacher_cache=cache)
    print(f"spd={spd} arm total {time.perf_counter() - t0:.1f}s "
          f"epoch_step_ms={spd_hist['epoch_step_ms']}", flush=True)
    print(f"  dispatch_ms={spd_hist['epoch_dispatch_ms']} "
          f"fetch_s={spd_hist['epoch_fetch_s']}", flush=True)

    live = live_hist["epoch_step_ms"][1]   # steady state (epoch 2)
    miss = cache_hist["epoch_step_ms"][0]  # includes compile
    replay = min(cache_hist["epoch_step_ms"][1:])
    replay_spd = min(spd_hist["epoch_step_ms"][1:])
    print(f"\nlive-teacher step:   {live:8.1f} ms wall")
    print(f"miss epoch step:     {miss:8.1f} ms wall (live + store)")
    print(f"replay epoch step:   {replay:8.1f} ms wall  "
          f"({live / replay:.2f}x vs live)")
    print(f"replay, spd={spd}:   {replay_spd:8.1f} ms wall  "
          f"({replay / replay_spd:.2f}x vs single-dispatch replay)")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
