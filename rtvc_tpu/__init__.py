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
- ``evaluate``      ➜ (new) standalone checkpoint scoring — the COCO sweep
                      the reference ran only at epoch end (model.py:1056)
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


def _host_fingerprint() -> str:
    """Short fingerprint of the host ISA + software stack.

    XLA:CPU AOT executables are compiled for the *build host's* machine
    features; sharing one persistent cache dir across hosts with different
    CPUs produced "machine features don't match ... could lead to SIGILL"
    warnings (and a real SIGILL risk). Scoping the cache dir by host
    fingerprint makes stale cross-machine entries unreachable."""
    import hashlib
    import platform

    bits = [platform.machine(), platform.system()]
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                # first core is representative; take each field once
                if key in ("model name", "flags", "Features") and key not in seen:
                    seen.add(key)
                    bits.append(line.strip())
    except OSError:
        pass
    try:
        import jax
        bits.append(jax.__version__)
    except Exception:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def _cap_cpu_isa() -> None:
    """Cap XLA:CPU codegen at AVX2 (opt out: RTVC_NO_CPU_ISA_CAP=1).

    When XLA:CPU targets AVX512 it tags AOT executables with the LLVM
    *tuning* pseudo-features ``+prefer-no-scatter``/``+prefer-no-gather``,
    which never appear in host CPUID detection — so reloading a persistent
    cache entry logs a scary "could lead to SIGILL" error EVEN ON THE SAME
    MACHINE (verified empirically; AVX2-capped compiles reload silently).
    CPU here is only the test/dryrun platform — TPU compiles ignore
    ``xla_cpu_*`` flags — so the cap costs nothing on the compute path.
    Must run before jax initializes its backends; no-op afterwards."""
    if _os.environ.get("RTVC_NO_CPU_ISA_CAP") == "1":
        return
    flags = _os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        _os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the flagship captioning program
    takes minutes to compile cold on TPU; cached reloads are ~seconds.
    The directory is scoped per host fingerprint (see above)."""
    try:
        import jax

        base = _os.environ.get(
            "RTVC_JAX_CACHE",
            _os.path.expanduser("~/.cache/rtvc_jax_cache"))
        cache_dir = _os.path.join(base, _host_fingerprint())
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never let cache plumbing break imports
        import warnings

        warnings.warn(f"rtvc_tpu: persistent XLA compile cache disabled ({e})")


_cap_cpu_isa()
_enable_compilation_cache()
