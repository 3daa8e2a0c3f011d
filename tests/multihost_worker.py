"""Worker process for the 2-process jax.distributed correctness test.

Launched by tests/test_multihost.py as ``python tests/multihost_worker.py
<coordinator> <num_processes> <process_id> <outdir>``. Each worker is one
controller of a 2-process × 4-virtual-CPU-device cluster (global dp=8 mesh
— the same global mesh shape the single-process suite uses), feeds its
host-local half of the global batch through the full ``train()`` entry, and
process 0 writes the loss history for the parent to compare against a
single-process run of the identical global batch.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coord, nproc, pid, outdir = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    # the sandbox's axon TPU-tunnel plugin ignores the JAX_PLATFORMS env
    # var; the platform must be forced through jax.config (same note in
    # tests/conftest.py) BEFORE the backend initializes
    import jax
    jax.config.update("jax_platforms", "cpu")

    # must run before any other JAX call (train.main does the same)
    from rtvc_tpu.parallel.multihost import initialize_distributed
    assert initialize_distributed(coord, int(nproc), int(pid))

    import numpy as np

    assert jax.process_count() == int(nproc)
    assert len(jax.devices()) == 4 * int(nproc)

    from rtvc_tpu.config import from_dict
    from rtvc_tpu.models.clip_vit import CLIPViTConfig
    from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher
    from rtvc_tpu.models.student import StudentCandidateV1
    from rtvc_tpu.models.tinyvit import TinyViTConfig
    from rtvc_tpu.parallel.multihost import host_batch_slice
    from rtvc_tpu.tokenization import BertWordPieceTokenizer
    from rtvc_tpu.train import train

    # identical tiny models/batches to tests/test_train.py's fixtures
    enc = TinyViTConfig(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 2, 2), window_sizes=(4, 4, 4, 4),
                        drop_path_rate=0.0)
    clip64 = CLIPViTConfig(image_size=64, patch_size=16, width=32, layers=2,
                           heads=2)
    git64 = GITConfig(vocab_size=173, hidden_size=16, num_layers=2,
                      attention_heads=2, feedforward_size=32,
                      visual_feature_size=32, max_caption_length=64,
                      num_image_with_embedding=2, clip=clip64)
    student = StudentCandidateV1(
        d_model=32, n_head=4, d_ffn=64, dropout=0.1, num_decoder_layers=2,
        vocab_size=173, max_pos_len=64, encoder_config=enc,
        teacher_visual_dim=32, teacher_num_tokens=2 * 17, teacher_hidden=16)
    teacher = GITTeacher(git64)

    def synth_batch(b=8, f=2, t=6, vocab=173, seed=0):
        rng = np.random.default_rng(seed)
        frames = rng.normal(size=(b, f, 64, 64, 3)).astype(np.float32)
        caps = np.zeros((b, t), np.int32)
        caps[:, 0] = 101
        lens = rng.integers(2, t, size=b)
        for i in range(b):
            caps[i, 1:lens[i]] = rng.integers(3, vocab, size=lens[i] - 1)
        return {"frames": frames, "caption": caps}

    start, stop = host_batch_slice(8, jax.process_index(),
                                   jax.process_count())
    # two global batches of 8, each host feeding ONLY rows [start:stop)
    loader = [{k: v[start:stop] for k, v in synth_batch(seed=s).items()}
              for s in (0, 1)]

    config = from_dict({
        "logger": {"save_dir": os.path.join(outdir, "run")},
        "train": {"lr": 1e-3, "batch_size": 8,
                  "trainer": {"max_epochs": 1,
                              "enable_checkpointing": False}},
        "wandb": {"mode": "disabled"},
    })
    tvars = teacher.init(jax.random.PRNGKey(1),
                         jax.numpy.asarray(synth_batch(b=1)["frames"]),
                         jax.numpy.asarray(synth_batch(b=1)["caption"]))
    _, hist = train(config, loader, [], [], BertWordPieceTokenizer(),
                    run_name=f"mh{pid}", student=student, teacher=teacher,
                    teacher_vars=tvars, max_epochs=1, use_orbax=False)
    if jax.process_index() == 0:
        with open(os.path.join(outdir, "losses.json"), "w") as f:
            json.dump({"train_loss": hist["train_loss"]}, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
