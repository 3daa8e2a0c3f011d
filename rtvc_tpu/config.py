"""Typed configuration tree.

Mirrors the reference's single global ``cfg`` dict (reference config.py:39-95)
with the same keys and defaults, but as frozen dataclasses with validation and
a dict-compatible view (``cfg["TRAIN"]["BATCH_SIZE"]`` keeps working for code
written against the reference API).

TPU-specific additions live under ``Config.tpu``: mesh shape, precision
policy, decode lengths, and prefetch depth — the reference delegated all of
this to Lightning (``strategy: 'auto'``, ``precision: 16``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Tuple


@dataclass(frozen=True)
class DataConfig:
    # Same paths/semantics as reference config.py:42-47.
    videos_path: str = "data/MSRVTT/videos/all"
    captions_path: str = "data/labels/labels.csv"
    encoded_caption_ids: str = "data/labels/encoded_captions.pkl"
    annotation_path: str = "data/MSRVTT/annotation/MSR_VTT.json"
    num_frames: int = 6
    # Host-pipeline additions (no reference equivalent: reference used
    # torch DataLoader workers, src/train.py:76-112).
    prefetch_depth: int = 2
    sampler: str = "even"  # one of data.frame_sampling.SAMPLERS
    # WordNet database dir (or synonym-group file) enabling METEOR's
    # synonym match stage (metrics.load_wordnet_synonyms). '' = exact+stem
    # only (WordNet data is unavailable offline in this sandbox; the stage
    # lights up the moment data exists at this path).
    wordnet_path: str = ""


@dataclass(frozen=True)
class CheckpointConfig:
    # Reference config.py:48-55 (Lightning ModelCheckpoint args).
    dirpath: str = "results/"
    filename: str = "model-{epoch:02d}"
    save_top_k: int = 1
    monitor: str = "epoch"
    mode: str = "max"


@dataclass(frozen=True)
class LoggerConfig:
    # Reference config.py:56-60.
    save_dir: str = "results/"
    name: str = "captions"


@dataclass(frozen=True)
class TrainerConfig:
    # Reference config.py:63-70 (Lightning trainer args).
    max_epochs: int = 20
    precision: str = "bf16"  # reference used fp16 AMP; TPU-native is bf16
    enable_checkpointing: bool = True
    strategy: str = "data_parallel"  # reference: 'auto' (Lightning)


@dataclass(frozen=True)
class StudentConfig:
    # Reference config.py:76-84 (MODEL.StudentCandidateV1).
    image_enc_name: str = "tiny_vit_21m_224"
    d_model: int = 576
    n_head: int = 8
    d_ffn: int = 1024
    dropout: float = 0.3
    num_decoder_layers: int = 2
    vocab_size: int = 30522
    cls_token_id: int = 101
    sep_token_id: int = 102
    max_pos_len: int = 500  # PositionalEncoding max_len (model.py:324)
    # tanh-approx GELU in the TinyViT encoder: measured 21.9 -> 14.7 ms
    # per 48-frame encode on v5e (docs/PERF.md §1b; max activation shift
    # 1.5e-2 rel on random weights). timm's TinyViT uses exact erf — set
    # False for bit-faithful parity with converted timm activations
    # (parity tests pin the exact mode explicitly); the KD-trained student
    # treats the activation as a design choice, so fast is the default.
    gelu_approximate: bool = True


@dataclass(frozen=True)
class TeacherConfig:
    # Reference config.py:85-89 + parameter.yaml (GIT_LARGE_MSRVTT).
    param_path: str = "data/teacher_configs/GIT_LARGE_MSRVTT/parameter.yaml"
    pretrained_weights: str = "results/model.pt"
    num_image_with_embedding: int = 6
    visual_feature_size: int = 1024
    image_encoder_type: str = "CLIPViT_L_14"
    # get_git_model hyperparams (reference model.py:687-708)
    hidden_size: int = 768
    num_layers: int = 6
    attention_heads: int = 12
    feedforward_size: int = 3072
    vocab_size: int = 30522
    max_caption_length: int = 1024
    beam_size: int = 4
    max_steps: int = 15
    length_penalty: float = 0.6


@dataclass(frozen=True)
class TrainConfig:
    # Reference config.py:61-74.
    student_model_def: str = "StudentCandidateV1"
    teacher_model_def: str = "GenerativeImageTextTeacher"
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    lr: float = 1e-4
    batch_size: int = 8
    # ReduceLROnPlateau (the scheduler the reference actually returns,
    # model.py:1105-1113): patience 4, factor 0.5, min_lr 1e-8 on val_loss.
    plateau_patience: int = 4
    plateau_factor: float = 0.5
    plateau_min_lr: float = 1e-8
    # Frozen-teacher logit cache dir ('' = disabled). The reference's fixed
    # seed makes the (video, caption) pairing constant across epochs
    # (dataloader.py:66 + train.py:167-199), so teacher outputs are reusable.
    teacher_cache_dir: str = ""
    # 0 = cache full-vocab logits (bitwise-exact replay); K > 0 = store
    # only each position's top-K (logit, index) pairs — ~240x smaller at
    # K=128, replayed as a renormalized truncated distribution (approximate;
    # data/teacher_cache.py). Use when the device link is upload-bound.
    teacher_cache_top_k: int = 0
    # Beam-KD target cache dir ('' = disabled): same replay treatment for
    # the teacher's beam-search KD path (loss 5 / kd_source=
    # 'beam_consensus', reference model.py:762-793). The beam never sees
    # the ground-truth caption, so entries key on the vid alone; beam
    # hyperparameters are baked into the entry filenames
    # (data/teacher_cache.py::TeacherBeamCache).
    teacher_beam_cache_dir: str = ""
    # 0 = cache full-vocab consensus rows (exact replay); K > 0 = top-K
    # truncation like teacher_cache_top_k (~240x smaller, approximate).
    teacher_beam_cache_top_k: int = 0
    # 0 = greedy eval (the reference's validation path, model.py:1006);
    # > 0 = evaluate with the student's k-beam search instead (the
    # reference implemented beam search but never evaluated with it).
    eval_beam_size: int = 0
    # Write epoch-end checkpoints on a background thread (the fetch+disk
    # write of the full train state otherwise stalls the loop for tens of
    # seconds over a slow device link; data/io.py::AsyncCheckpointSaver).
    async_checkpointing: bool = True
    # LR schedule: "plateau" is the reference's ACTIVE scheduler (the
    # default here). The reference ALSO constructed a
    # OneCycleLR(max_lr=0.01, total_steps=epochs*steps) that its
    # configure_optimizers never returned (model.py:1110-1113 — dead
    # code); "onecycle" makes it a working option, implemented as an
    # in-graph optax cosine-onecycle schedule over the step counter
    # (torch-default pct_start 0.3, div_factor 25, final_div 1e4).
    # Requires a sized train loader (total_steps must be static).
    scheduler: str = "plateau"
    onecycle_max_lr: float = 0.01  # reference model.py:1111
    # Preemption-safe training: on SIGTERM (what SLURM / spot-TPU
    # reclamation sends) the train loop checkpoints the full train state
    # to <run_dir>/ckpt_preempt at the next step boundary and exits
    # cleanly; pass that path as train(resume_from=...) to continue.
    # Multi-host runs coordinate the stop at the next epoch boundary
    # (the flag is all-gathered with the epoch barrier). train.py
    # PreemptionGuard; no-op when signals can't be installed (not the
    # main thread).
    checkpoint_on_preemption: bool = True
    # Gradient accumulation: M > 1 scans the full per-batch computation
    # (teacher forward/beam included) over M equal microbatches inside the
    # step and applies ONE Adam update on the averaged gradients — peak
    # activation memory drops to the microbatch's while the effective
    # batch stays batch_size. Lightning accumulate_grad_batches semantics
    # (train.py make_train_step docstring has the exactness caveat).
    grad_accum_steps: int = 1


@dataclass(frozen=True)
class TpuConfig:
    """TPU-native execution knobs (new; no reference equivalent)."""

    mesh_shape: Tuple[int, ...] = (-1, 1)  # (dp, tp); -1 = all remaining chips
    mesh_axes: Tuple[str, ...] = ("dp", "tp")
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    use_pallas_attention: bool = True
    # Donating the train state halves its HBM footprint, but the tunneled
    # TPU runtime couples an execution's output lifetimes: donating step
    # N's state into step N+1 invalidates step N's METRIC outputs too, so
    # a loop that keeps per-step losses (train.py does, for the epoch
    # mean) hits zombie-buffer recovery (seconds/step) or
    # FAILED_PRECONDITION on fetch. Off by default; enable on standard
    # (non-tunneled) runtimes if the state's 2x footprint matters.
    donate_train_state: bool = False
    remat_encoder: bool = False
    # Host-loop -> device-loop: group K prepared batches into ONE dispatch
    # that lax.scan's the train step K times on device. Identical numerics
    # either way (pinned by tests/test_train.py). Measured verdict on the
    # v5e runtime of record: KEEP OFF — the async single-dispatch loop has
    # no dispatch gap to remove, and the scanned program runs ~40% slower
    # per step than back-to-back singles (45-48 vs 63-65 ms wall at K=4/8;
    # docs/PERF.md §3). The knob exists for runtimes where per-dispatch
    # latency is real. Single-device mesh only; groups consecutive batches
    # with identical array signatures (keys/shapes/dtypes — cache hits and
    # misses both group, since a miss feeds the step the same arrays a hit
    # would). A mid-epoch signature change (ragged tail, loader quirk)
    # drains the pending group singly, then grouping resumes at the new
    # signature; an end-of-epoch partial group always drains singly.
    steps_per_dispatch: int = 1
    # W8A8 frozen-teacher inference. Measured end-to-end verdict on the
    # v5e/XLA build of record: the full int8 distillation step is 1.06x
    # SLOWER than float (179.6 vs 169.8 ms median, docs/PERF.md §3) — the
    # knob stays off unless your runtime's int8 GEMMs actually win.
    quantize_teacher: bool = False
    # Multi-host (multi-process) execution: train.main calls
    # jax.distributed.initialize before building the global mesh, each host
    # feeds only its slice of the global batch (parallel/multihost.py), and
    # gradient collectives ride ICI within a slice / DCN across hosts.
    # Also enabled by the --multihost CLI flag.
    multihost: bool = False


@dataclass(frozen=True)
class WandbConfig:
    # Reference config.py:91-94. Offline by default here (zero-egress).
    mode: str = "offline"


@dataclass(frozen=True)
class Config:
    seed: int = 5  # reference config.py:40
    data: DataConfig = field(default_factory=DataConfig)
    callback: CheckpointConfig = field(default_factory=CheckpointConfig)
    logger: LoggerConfig = field(default_factory=LoggerConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    student: StudentConfig = field(default_factory=StudentConfig)
    teacher: TeacherConfig = field(default_factory=TeacherConfig)
    tpu: TpuConfig = field(default_factory=TpuConfig)
    wandb: WandbConfig = field(default_factory=WandbConfig)

    # ---- dict-compatible view (reference-style access) ------------------
    _ALIASES = {
        "SEED": ("seed",),
        "DATA": ("data",),
        "CALLBACK": ("callback",),
        "LOGGER": ("logger",),
        "TRAIN": ("train",),
        "MODEL": None,  # handled specially below
        "TPU": ("tpu",),
        "WANDB": ("wandb",),
    }

    def __getitem__(self, key: str) -> Any:
        if key == "MODEL":
            return {
                "StudentCandidateV1": _as_view(self.student),
                "GenerativeImageTextTeacher": _as_view(self.teacher),
            }
        path = self._ALIASES.get(key)
        if path is None:
            raise KeyError(key)
        obj: Any = self
        for attr in path:
            obj = getattr(obj, attr)
        return _as_view(obj)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


class _DictView(dict):
    """Read-only dict view over a dataclass, with reference-style UPPER keys."""


_UPPER_KEYS = {
    # reference key -> dataclass attr
    "VIDEOS_PATH": "videos_path",
    "CAPTIONS_PATH": "captions_path",
    "ENCODED_CAPTION_IDS": "encoded_caption_ids",
    "STUDENT_MODEL_DEF": "student_model_def",
    "TEACHER_MODEL_DEF": "teacher_model_def",
    "TRAINER": "trainer",
    "LR": "lr",
    "BATCH_SIZE": "batch_size",
    "MODE": "mode",
    "max_epochs": "max_epochs",
    "precision": "precision",
    "enable_checkpointing": "enable_checkpointing",
    "strategy": "strategy",
}


def _as_view(obj: Any) -> Any:
    if not dataclasses.is_dataclass(obj):
        return obj
    view = _DictView()
    for f in dataclasses.fields(obj):
        value = getattr(obj, f.name)
        view[f.name] = _as_view(value)
    # add reference-style UPPER aliases
    for upper, attr in _UPPER_KEYS.items():
        if attr in view and upper not in view:
            view[upper] = view[attr]
    return view


def from_dict(overrides: Mapping[str, Any], base: Config | None = None) -> Config:
    """Build a Config from a (possibly nested) plain-dict override tree."""
    base = base or Config()

    def merge(dc: Any, over: Mapping[str, Any]) -> Any:
        updates = {}
        fields = {f.name: f for f in dataclasses.fields(dc)}
        for key, value in over.items():
            name = key.lower() if key.lower() in fields else key
            if name not in fields:
                raise KeyError(f"unknown config key {key!r} for {type(dc).__name__}")
            current = getattr(dc, name)
            if dataclasses.is_dataclass(current) and isinstance(value, Mapping):
                updates[name] = merge(current, value)
            else:
                updates[name] = value
        return dataclasses.replace(dc, **updates)

    return merge(base, overrides)


# The global default, mirroring the reference's module-level ``cfg``.
cfg = Config()
