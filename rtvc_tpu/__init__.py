"""rtvc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) real-time video-captioning framework.

A from-scratch rebuild of the capabilities of
``farazali7/real-time-video-captioning`` (knowledge distillation of a
GIT-Large video-captioning teacher into a TinyViT + Transformer-decoder
student, MSRVTT training/eval with COCO captioning metrics, magnitude
pruning, and a real-time webcam captioning loop) — redesigned TPU-first:

- compute path: JAX + XLA with Pallas flash-attention kernels,
  fixed-shape ``lax.while_loop``/``lax.scan`` decode loops with KV caches;
- parallelism: ``jax.sharding.Mesh`` + NamedSharding (data parallel over
  the ``dp`` axis, optional tensor parallel over ``tp``), XLA collectives
  over ICI — no NCCL/Lightning;
- host path: cv2 video decode + content-aware frame samplers feeding a
  double-buffered device staging pipeline.

Package map (reference layer ➜ here, citations are reference file:line):

- ``config``        ➜ reference ``config.py:39-95`` (typed, same keys)
- ``tokenization``  ➜ ``src/utils/tokenizer.py`` + HF BertTokenizer usage
- ``ops``           ➜ attention/masking/preprocess kernels (replaces cuDNN
                      SDPA in ``nn.TransformerDecoderLayer``, torchvision
                      transforms at ``src/utils/dataloader.py:14-32``)
- ``models``        ➜ ``src/models/model.py`` (TinyViT, student, GIT teacher)
- ``decode``        ➜ ``model.py:156-317`` (greedy/beam) + ``:465-678``
- ``distill``       ➜ ``model.py:796-1150`` (DistillationTrainer losses)
- ``train/inference/real_time_inference/pruning_test`` ➜ ``src/*.py``
- ``metrics``       ➜ ``src/metrics.py`` (pure-Python COCO metric suite)
- ``data``          ➜ ``src/utils/{dataloader,video_handlers,frame_sampling_methods,io}.py``
- ``parallel``      ➜ (new; reference had only Lightning ``strategy:'auto'``,
                      config.py:69)
"""

__version__ = "0.1.0"

import os as _os

# Zero-egress environment: make sure nothing tries to reach huggingface.co.
_os.environ.setdefault("HF_HUB_OFFLINE", "1")
_os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the flagship captioning program
    takes minutes to compile cold on TPU; cached reloads are ~seconds."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "RTVC_JAX_CACHE",
            _os.path.expanduser("~/.cache/rtvc_jax_cache"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache plumbing break imports
        pass


_enable_compilation_cache()
