"""Distillation training loop (reference src/train.py + DistillationTrainer).

Replaces PyTorch Lightning (reference train.py:137-152, model.py:796-1150)
with an explicit JAX loop:

- one jit-compiled, state-donating ``train_step`` computing the student
  forward (dropout + BatchNorm stats), the frozen teacher's teacher-forced
  logits, the configured distillation losses (active = KL + CE,
  model.py:983), Adam updates (optax, lr 1e-4 — config.py:72), all as a
  single XLA program;
- data parallelism by construction: batches arrive sharded over the mesh's
  ``dp`` axis, params replicated (or tp-sharded); XLA inserts the gradient
  all-reduce over ICI (parallel/mesh.py);
- ``ReduceLROnPlateau`` semantics host-side between epochs (patience 4,
  factor 0.5, min_lr 1e-8 monitoring val_loss in 'min' mode —
  model.py:1105-1113; note the reference "val_loss" is actually corpus
  BLEU-4, model.py:1021-1035, quirk preserved);
- validation/test: greedy decode with ``max_len = caption_len + 5``
  (model.py:1010), BLEU-4 per step, COCO metric sweep at epoch end
  (model.py:1054-1057), transcripts appended to the run file;
- orbax checkpointing of the FULL train state each epoch (keep-latest,
  mirroring the reference's monitor='epoch'/mode='max' ModelCheckpoint,
  config.py:47-54) — plus optimizer state, which the reference never saved.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
import sys
import time
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from . import decode as decode_lib
from . import metrics as metrics_lib
from .config import Config, cfg as default_cfg
from .data import teacher_cache as data_teacher_cache
from .data.io import save_checkpoint
from .distill import LossWeights, distillation_losses
from .models.git_teacher import GITTeacher, teacher_from_config
from .models.student import StudentCandidateV1, student_from_config
from .parallel.mesh import make_mesh, place_params, replicate
from .utils.logging import RunLogger
from .utils.profiling import StepTimer

# teacher encoder blocks tapped for the fmap loss (reference model.py:844:
# torch.arange(0, 23, 6) → [0, 6, 12, 18])
TEACHER_TAP_BLOCKS = (0, 6, 12, 18)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (reference model.py:1105-1110): factor 0.5,
    patience 4, min_lr 1e-8, mode 'min' (torch default)."""

    lr: float
    factor: float = 0.5
    patience: int = 4
    min_lr: float = 1e-8
    best: float = float("inf")
    bad_epochs: int = 0

    def update(self, monitored: float) -> float:
        if monitored < self.best:
            self.best = monitored
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


class _NullLogger:
    """No-op logger for non-zero hosts in multi-host runs: one writer
    (process 0) owns the run file / scalars / wandb channel."""

    def write(self, text: str) -> None:
        pass

    def log_scalars(self, step: int, scalars) -> None:
        pass

    def log_epoch_transcript(self, *a, **k) -> None:
        pass

    def finish(self) -> None:
        pass


def _prune_checkpoints(run_dir: str, keep: int) -> None:
    """Keep only the newest ``keep`` checkpoints (reference ModelCheckpoint
    save_top_k=1 monitoring 'epoch' == keep-latest, config.py:47-54)."""
    import shutil
    ckpts = sorted(d for d in os.listdir(run_dir) if d.startswith("ckpt_")
                   and os.path.isdir(os.path.join(run_dir, d)))
    for stale in ckpts[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(run_dir, stale), ignore_errors=True)
        try:  # the checkpoint's sidecar metadata goes with it
            os.remove(os.path.join(run_dir, stale + ".meta.json"))
        except OSError:
            pass


def plot_loss(values, label: str, out_path: str) -> None:
    """Loss-curve plot (reference train.py:28-39). Headless-safe (Agg)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(range(len(values)), values, label=label)
    ax.set_xlabel("Epoch")
    ax.set_ylabel(label)
    ax.legend()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def create_train_state(student: StudentCandidateV1, rng: jax.Array,
                       batch_example: Dict[str, jnp.ndarray],
                       tx: optax.GradientTransformation) -> TrainState:
    # jitted init: one compiled program instead of thousands of small
    # dispatches (300s → 26s for the full-size student on the TPU tunnel)
    init_fn = jax.jit(functools.partial(student.init,
                                        method=StudentCandidateV1.full_init))
    variables = init_fn(rng, batch_example["frames"],
                        batch_example["caption"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(student: StudentCandidateV1, teacher: GITTeacher,
                    tx: optax.GradientTransformation,
                    weights: LossWeights = LossWeights(),
                    donate: bool = True, kd_beam_size: int = 4,
                    kd_max_steps: int = 15, kd_length_penalty: float = 0.6,
                    external_teacher_logits: bool = False,
                    cache_top_k: int = 0,
                    external_teacher_beam: bool = False,
                    beam_cache_top_k: int = 0,
                    steps_per_dispatch: int = 1,
                    grad_accum: int = 1):
    """Build the jitted distillation train step.

    ``steps_per_dispatch > 1`` returns the multi-step variant instead: it
    takes batches whose leaves are stacked on a leading [K] axis and runs
    the step K times in ONE device program (``lax.scan`` over the stack),
    returning (final_state, metrics-with-[K]-leaves). Numerically
    identical to K single dispatches (same ops, same rng folding; pinned
    by tests/test_train.py::test_multi_step_dispatch_matches_singles).

    ``grad_accum = M > 1`` splits every batch into M equal microbatches
    inside the step (``lax.scan``), runs the FULL per-batch computation —
    teacher forward/beam included — per microbatch, and applies ONE
    optimizer update on the microbatch-averaged gradients. This bounds
    peak activation (and live-teacher) memory at the microbatch size
    while training at M× the effective batch. Semantics match Lightning's
    ``accumulate_grad_batches`` (the distribution channel the reference
    left implicit): each microbatch's losses are mean-normalized within
    the microbatch, so the averaged gradient equals the full-batch
    gradient exactly only when valid-token counts are equal across
    microbatches — close in practice, and pinned within tolerance by
    tests/test_train.py. Dropout draws independent noise per microbatch
    (``fold_in(step_rng, micro_idx)``); batch_stats thread sequentially
    through the scan, matching M consecutive small-batch steps.

    The teacher is frozen (reference model.py:741-745): its variables are a
    closed-over constant input, no gradients flow into it.

    When ``weights.ce_teacher != 0`` or ``weights.kd_source ==
    'beam_consensus'`` the step additionally runs the teacher's beam search
    in-graph (the reference's ``teacher.forward`` KD-target path,
    model.py:762-793) — loss 5 trains the student on the teacher's GENERATED
    tokens, and the consensus mode distills against the per-word best-beam
    logit rows instead of teacher-forced logits.
    """
    need_fmap = weights.fmap != 0.0
    need_visual = weights.final_enc != 0.0
    need_decoder = weights.decoder != 0.0
    need_beam = (weights.ce_teacher != 0.0
                 or weights.kd_source == "beam_consensus")
    # teacher-forced forward needed unless consensus KD replaces it AND no
    # intermediate-activation loss wants the forced pass's byproducts
    need_forced = (weights.kd_source == "teacher_forced" or need_fmap
                   or need_visual or need_decoder)
    if external_teacher_logits and (need_fmap or need_visual or need_decoder):
        raise ValueError(
            "external_teacher_logits (teacher-output caching) supports only "
            "the kl+ce teacher-forced path; intermediate-activation losses "
            "need the live teacher forward's taps in the step")
    if external_teacher_logits and need_beam and not external_teacher_beam:
        raise ValueError(
            "beam-KD losses with a forced-logit cache also need the beam "
            "cache (external_teacher_beam=True / "
            "cfg.train.teacher_beam_cache_dir) — the beam targets are "
            "cacheable too (they depend only on the video)")
    if external_teacher_beam and not need_beam:
        raise ValueError(
            "external_teacher_beam set but no loss consumes beam targets "
            "(weights.ce_teacher == 0 and kd_source != 'beam_consensus')")
    taps = TEACHER_TAP_BLOCKS if need_fmap else ()
    eos = 102  # SEP doubles as teacher pad (reference model.py:487)

    def _batch_grads(params, batch_stats, teacher_vars, batch, dropout_rng):
        """grads + loss metrics + updated batch_stats for ONE (micro)batch —
        the full per-batch computation (teacher forward/beam included),
        shared verbatim by the plain step and the grad-accum scan body."""
        frames, captions = batch["frames"], batch["caption"]

        t_logits = t_visual = None
        t_hidden = t_taps = ()
        if external_teacher_logits:
            # frozen-teacher logits replayed from the cache (see
            # data/teacher_cache.py); bitwise-equal to a live forward.
            # Top-K mode: only the ~40 KB/sample (value, index) pair enters
            # the step — the dense [B, T, V] tensor is rebuilt HERE, inside
            # the jitted program, so it only ever exists in HBM and the
            # densify fuses with the loss instead of being its own dispatch.
            if cache_top_k:
                from .data.teacher_cache import densify_topk
                t_logits = densify_topk(batch["teacher_topk_vals"],
                                        batch["teacher_topk_idx"],
                                        teacher.config.vocab_size)
            else:
                t_logits = batch["teacher_logits"]
            t_logits = jax.lax.stop_gradient(t_logits)
        elif need_forced:
            t_logits, t_visual, t_hidden, t_taps = teacher.apply(
                teacher_vars, frames, captions, taps or None,
                method=lambda mdl, f, c, b: mdl.forward_output_logits(f, c, b))
            t_logits = jax.lax.stop_gradient(t_logits)

        teacher_tokens = kd_logits = kd_valid = None
        if need_beam:
            t_len = captions.shape[1]
            kd_all = None
            if external_teacher_beam:
                # beam targets replayed from the TeacherBeamCache
                # (data/teacher_cache.py) — the beam search depends only on
                # the video, so epoch-2+ steps skip it entirely. preds and
                # the consensus rows are the cached copies of exactly what
                # the live branch below computes; the n_words/valid/slice
                # derivations run identically on them.
                preds = jax.lax.stop_gradient(
                    batch["teacher_beam_predictions"])
                if weights.kd_source == "beam_consensus":
                    if beam_cache_top_k:
                        from .data.teacher_cache import densify_topk
                        kd_all = densify_topk(batch["teacher_kd_vals"],
                                              batch["teacher_kd_idx"],
                                              teacher.config.vocab_size)
                    else:
                        kd_all = batch["teacher_kd_logits"]
                    kd_all = jax.lax.stop_gradient(kd_all)
            else:
                beam = decode_lib.teacher_beam(
                    teacher, teacher_vars, frames, beam_size=kd_beam_size,
                    max_steps=kd_max_steps,
                    length_penalty=kd_length_penalty)
                preds = jax.lax.stop_gradient(beam.predictions)
            if weights.ce_teacher != 0.0:
                # loss 5: teacher tokens truncated / SEP-padded to the
                # student's caption length (reference model.py:946-961)
                if preds.shape[1] >= t_len:
                    teacher_tokens = preds[:, :t_len]
                else:
                    teacher_tokens = jnp.pad(
                        preds, ((0, 0), (0, t_len - preds.shape[1])),
                        constant_values=eos)
            if weights.kd_source == "beam_consensus":
                words = preds[:, 1:]                      # [B, steps]
                has_eos = jnp.any(words == eos, axis=1)
                first_eos = jnp.argmax(words == eos, axis=1)
                n_words = jnp.where(has_eos, first_eos, words.shape[1])
                if kd_all is None:
                    kd_all, valid_all = decode_lib.teacher_kd_targets(
                        beam, n_words.astype(jnp.int32))
                else:
                    steps = kd_all.shape[1]
                    n = jnp.minimum(n_words.astype(jnp.int32), steps)
                    valid_all = jnp.arange(steps)[None, :] < n[:, None]
                s = min(t_len, kd_all.shape[1])
                kd_logits = jax.lax.stop_gradient(kd_all[:, :s])
                kd_valid = valid_all[:, :s]

        def loss_fn(params):
            outs, mutated = student.apply(
                {"params": params, "batch_stats": batch_stats},
                frames, captions, True, need_fmap, need_visual, need_decoder,
                method=lambda mdl, f, c, tr, a, b_, d: mdl.distill_forward(
                    f, c, tr, a, b_, d),
                mutable=["batch_stats"], rngs={"dropout": dropout_rng})
            losses = distillation_losses(
                student_logits=outs["logits"],
                teacher_logits=t_logits,
                targets=captions,
                weights=weights,
                student_proj_means=outs.get("proj_means"),
                teacher_cls_taps=[jax.lax.stop_gradient(t) for t in t_taps]
                if need_fmap else None,
                student_visual=outs.get("student_visual"),
                teacher_visual=jax.lax.stop_gradient(t_visual)
                if need_visual else None,
                teacher_tokens=teacher_tokens,
                teacher_kd_logits=kd_logits,
                teacher_kd_valid=kd_valid,
                student_hidden_proj=outs.get("hidden_proj"),
                teacher_hidden=[jax.lax.stop_gradient(h) for h in t_hidden]
                if need_decoder else None,
                teacher_prefix_len=t_visual.shape[1]
                if t_visual is not None else 0,
            )
            return losses["total"], (losses, mutated["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, losses, new_stats

    def step_fn(state: TrainState, teacher_vars, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        if grad_accum <= 1:
            grads, losses, new_stats = _batch_grads(
                state.params, state.batch_stats, teacher_vars, batch,
                dropout_rng)
        else:
            bsz = batch["frames"].shape[0]
            if bsz % grad_accum:
                raise ValueError(
                    f"grad_accum={grad_accum} must divide batch size {bsz}")

            def split(x):
                return x.reshape((grad_accum, bsz // grad_accum)
                                 + x.shape[1:])

            micro = jax.tree.map(split, batch)
            first = jax.tree.map(lambda x: x[0], micro)
            g_shape, l_shape, _ = jax.eval_shape(
                _batch_grads, state.params, state.batch_stats, teacher_vars,
                first, dropout_rng)

            def body(carry, xs):
                stats, g_sum, l_sum = carry
                i, mb = xs
                g, losses, stats = _batch_grads(
                    state.params, stats, teacher_vars, mb,
                    jax.random.fold_in(dropout_rng, i))
                return (stats,
                        jax.tree.map(jnp.add, g_sum, g),
                        jax.tree.map(jnp.add, l_sum, losses)), None

            zeros = lambda t: jax.tree.map(  # noqa: E731
                lambda s: jnp.zeros(s.shape, s.dtype), t)
            (new_stats, g_sum, l_sum), _ = jax.lax.scan(
                body, (state.batch_stats, zeros(g_shape), zeros(l_shape)),
                (jnp.arange(grad_accum), micro))
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, g_sum)
            losses = jax.tree.map(lambda v: v * inv, l_sum)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if steps_per_dispatch > 1:
        # host-loop -> device-loop: ONE dispatch scans the step over K
        # batches stacked on a new leading axis; removes the per-step
        # dispatch gap (~9.6 ms/step over the tunnel, docs/PERF.md §3).
        # Metrics come back with [K]-leading leaves, one entry per step.
        # The dropout rng still varies per scanned step: step_fn folds the
        # base rng with state.step, which increments inside the scan.
        def multi_fn(state: TrainState, teacher_vars, batches, rng):
            def body(st, b):
                return step_fn(st, teacher_vars, b, rng)
            return jax.lax.scan(body, state, batches)

        return jax.jit(multi_fn, donate_argnums=(0,) if donate else ())

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(student: StudentCandidateV1, max_len: int):
    """Greedy-decode eval step (reference validation_step, model.py:1006)."""
    def eval_fn(variables, frames):
        return decode_lib.student_greedy(student, variables, frames,
                                         max_len=max_len)
    return eval_fn


def evaluate(student, variables, loader, tokenizer, logger: RunLogger,
             epoch: int, split: str, max_len_extra: int = 5,
             annotations: Optional[Dict[str, List[str]]] = None,
             verbose: bool = True,
             beam_size: int = 0) -> Tuple[float, List[dict]]:
    """Validation/test epoch: greedy decode, BLEU-4, transcripts, COCO accum
    (reference model.py:1006-1102).

    ``beam_size > 0`` evaluates with the student's beam search instead of
    greedy — the reference implemented beam search (model.py:189-317) but
    never wired it into evaluation; here it is one knob
    (``cfg.train.eval_beam_size``)."""
    all_bleu: List[float] = []
    outputs: List[dict] = []
    # Two phases so decode dispatches pipeline on-device instead of
    # serializing on host-side detokenize/BLEU between batches (the same
    # fetch-per-step stall the train loop avoids; tokens are tiny int
    # arrays, so holding every batch's result on device is free).
    pending: List[Tuple[Any, np.ndarray, Any]] = []
    for batch in loader:
        y = np.asarray(batch["caption"])
        max_len = int(y.shape[-1]) + max_len_extra  # model.py:1010
        if beam_size > 0:
            tokens = decode_lib.student_beam(student, variables,
                                             batch["frames"],
                                             max_len=max_len, k=beam_size)
        else:
            tokens = decode_lib.student_greedy(student, variables,
                                               batch["frames"],
                                               max_len=max_len)
        pending.append((tokens, y, batch["vid-id"]))
    for tokens, y, vid_ids in pending:
        tokens = np.asarray(tokens)
        preds = [tokenizer.decode(t, skip_special_tokens=True) for t in tokens]
        caps = [tokenizer.decode(c, skip_special_tokens=True) for c in y]
        caps_wrapped = [[c] for c in caps]
        bleu4 = metrics_lib.calculate_bleu_score_corpus(caps_wrapped, preds)
        all_bleu.append(bleu4)
        if verbose:  # reference printed per step (model.py:1023-1025)
            print(f"Ground-Truth Captions: {caps_wrapped}")
            print(f"Student Predictions: {preds}")
            print(f"BLEU@4: {bleu4}")
        logger.log_epoch_transcript(split, epoch, caps_wrapped, preds, bleu4)
        for vid, pred in zip(vid_ids, preds):
            outputs.append({"image_id": str(vid), "caption": pred})
    mean_bleu = float(np.mean(all_bleu)) if all_bleu else 0.0
    if annotations:
        scores = metrics_lib.evaluate_captions(outputs, annotations)
        logger.write("\n\n" + split + " COCO metrics: "
                     + str({k: v * 100 for k, v in scores.items()}) + "\n")
        logger.log_scalars(epoch, {f"{split}_{k}": v * 100
                                   for k, v in scores.items()})
    return mean_bleu, outputs


def set_learning_rate(opt_state, lr: float):
    """Update the injected-hyperparams learning rate IN PLACE, preserving
    the leaf's EXACT abstract value and placement.

    ``jnp.full_like(leaf, lr)`` keeps dtype, weak-type, sharding and
    device of the existing leaf. Anything less exact re-traces the train
    step: a plain ``jnp.asarray(lr, jnp.float32)`` differs in weak-type
    from the scalar ``optax.inject_hyperparams`` created inside jit, and
    that one-leaf aval change recompiled the full distillation step at
    EVERY epoch boundary (measured: two ~100 s dispatch stalls per epoch
    on the TPU tunnel; 163 ms/step once the leaf matches)."""
    leaf = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.full_like(leaf, lr)
    return opt_state


class PreemptionGuard:
    """SIGTERM → flag; train() checkpoints and exits cleanly.

    The reference had no preemption story (Lightning would simply die with
    the SLURM job); on preemptible/spot TPUs a reclaim notice is routine,
    so the TPU-native loop treats it as a first-class event: the handler
    only sets a flag, and the train loop — the sole owner of the device
    state — saves ``ckpt_preempt`` at the next step boundary (single-host)
    or the next epoch barrier (multi-host, where every process must agree
    to stop before one leaves the collectives).

    Installs handlers only when possible (main thread); otherwise stays a
    no-op so library callers embedding train() in a worker thread are
    unaffected. ``restore()`` reinstates the previous handlers.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._flag = False
        self._prev = {}
        for s in (signals or (_signal.SIGTERM,)):
            try:
                self._prev[s] = _signal.signal(s, self._handle)
            except ValueError:  # not the main thread
                pass

    def _handle(self, signum, frame):
        self._flag = True

    @property
    def triggered(self) -> bool:
        return self._flag

    def restore(self) -> None:
        import signal as _signal

        for s, h in self._prev.items():
            _signal.signal(s, h)
        self._prev = {}


def _any_host_triggered(local: bool) -> bool:
    """All-gather a per-host preemption flag (multi-host epoch barrier)."""
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray(bool(local), np.int32))
    return bool(np.asarray(flags).max())


def _eval_on_main(student, inference_vars, loader, tokenizer, logger, epoch,
                  split, annotations, beam_size, is_main: bool) -> float:
    """Multi-host eval: process 0 evaluates on a host-local replica of the
    replicated params; the scalar is then broadcast so every host's plateau
    scheduler sees the same monitored value (a collective all hosts join —
    it doubles as the epoch barrier)."""
    import numpy as _np
    from jax.experimental import multihost_utils

    bleu = 0.0
    if is_main:
        # params/batch_stats are fully replicated → np fetch is local-only
        local_vars = jax.device_put(
            jax.tree.map(lambda x: _np.asarray(x), inference_vars))
        bleu, _ = evaluate(student, local_vars, loader, tokenizer, logger,
                           epoch, split, annotations=annotations,
                           beam_size=beam_size)
    return float(multihost_utils.broadcast_one_to_all(
        _np.asarray(bleu, _np.float32)))


def train(config: Config, train_loader: Iterable, val_loader, test_loader,
          tokenizer, run_name: str = "run",
          annotations: Optional[Dict[str, List[str]]] = None,
          student: Optional[StudentCandidateV1] = None,
          teacher: Optional[GITTeacher] = None,
          teacher_vars: Optional[Any] = None,
          loss_weights: LossWeights = LossWeights(),
          mesh=None, max_epochs: Optional[int] = None,
          use_orbax: bool = True,
          resume_from: Optional[str] = None,
          resume_schedule: bool = False,
          teacher_cache=None,
          teacher_beam_cache=None
          ) -> Tuple[TrainState, Dict[str, Any]]:
    """Full distillation run (reference train.py:42-157).

    ``resume_from``: path to an orbax checkpoint saved by a previous run —
    restores params, batch stats, optimizer state AND step, so training
    continues exactly (the reference never restored optimizer state).
    By default the run then trains ``max_epochs`` MORE epochs ("fine-tune
    further" semantics).

    ``resume_schedule=True``: complete the ORIGINAL schedule instead —
    ``max_epochs`` is the run's total, the epoch loop continues at the
    checkpoint's recorded position (``ckpt_preempt`` redoes the interrupted
    epoch from the first untrained batch; an epoch-end ``ckpt_NN`` starts
    at epoch N+1), the plateau scheduler's (best, bad_epochs, lr) are
    restored, and — when the train loader exposes ``set_epoch`` (
    data.dataset.DeviceLoader does) — the per-epoch shuffle order is
    re-aligned, so the completed run's step sequence (batches, dropout
    folds, LR trajectory) is exactly the uninterrupted run's: final params
    are BITWISE equal (pinned by tests/test_train.py). The reference had
    no resume story at all.

    ``teacher_cache``: a ``data.teacher_cache.TeacherLogitsCache`` (or a
    cache-dir string). The frozen teacher's forced logits are computed once
    per (video, caption) pair and replayed from disk on later epochs —
    bitwise-equal losses, with the teacher forward (the step's dominant
    FLOPs) removed from steady-state epochs. Only valid with the default
    kl+ce loss combination.

    ``teacher_beam_cache``: a ``data.teacher_cache.TeacherBeamCache`` (or a
    cache-dir string). Same replay treatment for the beam-KD target path
    (loss 5 / ``kd_source='beam_consensus'``, reference model.py:762-793):
    the teacher's beam search depends only on the video, so its
    predictions + beam-consensus logits are computed once per vid and
    replayed — the 465.5 ms/step beam search (docs/PERF.md §1) leaves the
    steady-state epochs entirely. Requires beam-KD losses to be active."""
    # Multi-host: this process is one of N controllers over a global mesh
    # (train.main --multihost → parallel/multihost.py initialize_distributed
    # ran before any JAX call). Process 0 owns logging/checkpoints/eval;
    # train steps are global SPMD programs every host drives in lockstep.
    multihost = jax.process_count() > 1
    is_main = jax.process_index() == 0
    run_dir = os.path.join(config.logger.save_dir, "run", run_name)
    os.makedirs(run_dir, exist_ok=True)
    if config.data.wordnet_path:  # METEOR synonym stage (metrics.py)
        metrics_lib.set_wordnet_path(config.data.wordnet_path)
    logger = _NullLogger() if not is_main else RunLogger(
        run_dir, run_name, config_dump={
        "Teacher model": "GITTeacher",
        "Teacher model configuration": dataclasses.asdict(config.teacher),
        "Student model": "StudentCandidateV1",
        "Student model configuration": dataclasses.asdict(config.student),
        "Learning Rate": config.train.lr,
        "Number of epochs": config.train.trainer.max_epochs,
        "Batch size": config.train.batch_size,
        "Precision": config.train.trainer.precision,
    }, use_wandb=config.wandb.mode != "disabled")

    student = student or student_from_config(config)
    teacher = teacher or teacher_from_config(config)
    if mesh is None:
        mesh = make_mesh(config.tpu.mesh_shape, config.tpu.mesh_axes)
        bsz = config.train.batch_size
        dp0, tp0 = mesh.shape.get("dp", 1), mesh.shape.get("tp", 1)
        if multihost and dp0 % jax.process_count():
            raise ValueError(
                f"multi-host run: mesh dp={dp0} must be a multiple of "
                f"process_count={jax.process_count()}")
        if multihost and tp0 > 1:
            raise ValueError(
                "multi-host eval fetches a host-local replica of the "
                "params (train.py _eval_on_main), which requires them "
                "fully replicated — use tp=1 across hosts, or shard tp "
                "within one host only")
        if not multihost and dp0 > 1 and bsz % dp0 != 0:
            # the default mesh must divide the configured batch — shrink dp
            # (explicitly, logged) rather than silently un-shard batches
            dp_new = math.gcd(bsz, dp0)
            logger.write(f"\nbatch_size {bsz} not divisible by dp={dp0}; "
                         f"using dp={dp_new} (idle devices: "
                         f"{dp0 * tp0 - dp_new * tp0})\n")
            mesh = make_mesh((dp_new, tp0), config.tpu.mesh_axes)

    rng = jax.random.PRNGKey(config.seed)
    first = next(iter(train_loader))
    example = {"frames": first["frames"], "caption": first["caption"]}

    sched = PlateauScheduler(lr=config.train.lr,
                             factor=config.train.plateau_factor,
                             patience=config.train.plateau_patience,
                             min_lr=config.train.plateau_min_lr)
    use_onecycle = getattr(config.train, "scheduler", "plateau") == "onecycle"
    if use_onecycle:
        # the reference's dead OneCycleLR (model.py:1110-1113) as a working
        # option: an in-graph schedule over the optimizer step counter —
        # no host-side lr splicing, so opt_state never changes aval.
        # NOTE: checkpoints are scheduler-specific (the opt_state pytree
        # differs from the plateau/inject_hyperparams one); resume with
        # the same cfg.train.scheduler.
        n_epochs = max_epochs or config.train.trainer.max_epochs
        try:
            steps_per_epoch = len(train_loader)
        except TypeError:
            raise ValueError(
                "cfg.train.scheduler='onecycle' needs a sized train_loader "
                "(len()) to fix total_steps; use 'plateau' with unsized "
                "loaders")
        onecycle = optax.cosine_onecycle_schedule(
            transition_steps=max(1, n_epochs * steps_per_epoch),
            peak_value=config.train.onecycle_max_lr)
        tx = optax.adam(learning_rate=onecycle)
    else:
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=config.train.lr)

    state = create_train_state(student, rng, example, tx)
    start_epoch = 0       # first epoch-loop index this run executes
    skip_batches = 0      # already-trained batches to skip in start_epoch
    if resume_schedule and resume_from is None:
        raise ValueError("resume_schedule=True needs resume_from")
    if resume_from is not None:
        from .data.io import checkpoint_meta, restore_checkpoint
        tree = restore_checkpoint(resume_from, target={
            "params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step})
        state = TrainState(params=tree["params"],
                           batch_stats=tree["batch_stats"],
                           opt_state=tree["opt_state"], step=tree["step"])
        logger.write(f"\nresumed from {resume_from} at step "
                     f"{int(state.step)}\n")
        meta_r = checkpoint_meta(resume_from)
        _g = meta_r.get("gelu_approximate")
        if _g is not None and bool(_g) != config.student.gelu_approximate:
            logger.write(
                f"WARNING: checkpoint was trained with gelu_approximate="
                f"{bool(_g)} but this run uses "
                f"{config.student.gelu_approximate} — set "
                f"cfg.student.gelu_approximate to match\n")
        if resume_schedule:
            if "epoch" not in meta_r:
                raise ValueError(
                    "resume_schedule=True needs a checkpoint that records "
                    "its schedule position ('epoch' in the meta sidecar) — "
                    f"{resume_from} predates that; resume without "
                    "resume_schedule for 'train max_epochs more' semantics")
            if meta_r.get("preempted"):
                # the interrupted epoch never finished: redo it from the
                # first batch that did NOT train before the SIGTERM
                start_epoch = int(meta_r["epoch"])
                skip_batches = int(meta_r.get("steps_into_epoch", 0))
            else:
                start_epoch = int(meta_r["epoch"]) + 1  # that epoch completed
            plateau_meta = meta_r.get("plateau")
            if plateau_meta is not None and not use_onecycle:
                # host-side scheduler state; the lr VALUE inside opt_state
                # was restored above, this keeps future anneals consistent
                sched.lr = float(plateau_meta["lr"])
                sched.best = float(plateau_meta["best"])
                sched.bad_epochs = int(plateau_meta["bad_epochs"])
            if hasattr(train_loader, "set_epoch"):
                # In a fresh run the example fetch above consumed one loader
                # iteration, so epoch e iterates with internal counter 1+e.
                # This run's example fetch consumed one too — pin the next
                # iteration to start_epoch's counter so shuffle orders match
                # the uninterrupted run's.
                train_loader.set_epoch(1 + start_epoch)
            logger.write(
                f"resuming schedule at epoch {start_epoch}"
                + (f" (skipping {skip_batches} already-trained batches)"
                   if skip_batches else "") + "\n")
    # Mesh placement ONLY for real multi-device meshes. On a trivial
    # 1-device mesh, NamedSharding-wrapping the param trees is not a no-op
    # on the tunneled TPU runtime: an executable whose inputs MIX
    # NamedSharding and plain committed arrays falls off the fast dispatch
    # path and round-trips the NamedSharding trees through the host EVERY
    # call (measured: 163 ms/step all-plain or all-replicated vs 16.7
    # s/step mixed — the 788 MB teacher tree at tunnel bandwidth). The
    # epoch-boundary set_lr used to create exactly that mix from epoch 1
    # on (an uncommitted host scalar inside an otherwise-placed opt_state);
    # it now preserves the leaf's sharding, and trivial meshes skip
    # placement entirely.
    if mesh.size > 1:
        state = state.replace(params=place_params(state.params, mesh),
                              batch_stats=replicate(state.batch_stats, mesh),
                              opt_state=replicate(state.opt_state, mesh))

    if teacher_vars is None:
        # random teacher (real weights come from models/convert.py).
        # JITTED init, like create_train_state: unjitted flax init is
        # thousands of tiny eager dispatches (~99 s vs 6 s over the
        # tunnel), and the resulting eager-built buffers poison the
        # donated train step — the runtime re-materializes the 788 MB
        # tree per call (measured 21 s/step vs 167 ms with jit-init
        # variables; /tmp transcript recorded in docs/PERF.md §3).
        t_rng = jax.random.PRNGKey(config.seed + 1)
        teacher_vars = jax.jit(teacher.init)(t_rng, example["frames"][:1],
                                             example["caption"][:1])
    if mesh.size > 1:
        teacher_vars = replicate(teacher_vars, mesh)

    if isinstance(teacher_cache, str):
        from .data.teacher_cache import TeacherLogitsCache
        teacher_cache = TeacherLogitsCache(
            teacher_cache, top_k=config.train.teacher_cache_top_k)
    kd_beam = (config.teacher.beam_size, config.teacher.max_steps,
               config.teacher.length_penalty)
    need_beam_targets = (loss_weights.ce_teacher != 0.0
                         or loss_weights.kd_source == "beam_consensus")
    if isinstance(teacher_beam_cache, str):
        from .data.teacher_cache import TeacherBeamCache
        teacher_beam_cache = TeacherBeamCache(
            teacher_beam_cache,
            top_k=getattr(config.train, "teacher_beam_cache_top_k", 0),
            beam_size=kd_beam[0], max_steps=kd_beam[1],
            length_penalty=kd_beam[2],
            store_consensus=loss_weights.kd_source == "beam_consensus")
    if teacher_beam_cache is not None and not need_beam_targets:
        raise ValueError(
            "teacher_beam_cache set but no beam-KD loss is active "
            "(loss_weights.ce_teacher == 0 and kd_source != "
            "'beam_consensus')")
    if (teacher_beam_cache is not None
            and loss_weights.kd_source == "beam_consensus"
            and not teacher_beam_cache.store_consensus):
        raise ValueError(
            "kd_source='beam_consensus' needs a TeacherBeamCache with "
            "store_consensus=True (this one stores predictions only)")
    grad_accum = max(1, int(getattr(config.train, "grad_accum_steps", 1)))
    step_cache_kwargs = dict(
        external_teacher_logits=teacher_cache is not None,
        cache_top_k=teacher_cache.top_k if teacher_cache is not None else 0,
        external_teacher_beam=teacher_beam_cache is not None,
        beam_cache_top_k=teacher_beam_cache.top_k
        if teacher_beam_cache is not None else 0)
    train_step = make_train_step(
        student, teacher, tx, loss_weights,
        donate=config.tpu.donate_train_state,
        kd_beam_size=kd_beam[0], kd_max_steps=kd_beam[1],
        kd_length_penalty=kd_beam[2],
        grad_accum=grad_accum, **step_cache_kwargs)
    teacher_fwd = jax.jit(lambda tv, f, c: teacher.apply(tv, f, c)) \
        if teacher_cache is not None else None
    teacher_beam_fwd = None
    if teacher_beam_cache is not None:
        # the miss path's live beam program: predictions + (optionally) the
        # FULL consensus logit rows [B, S, V] — the step re-derives
        # n_words/valid/slices from them exactly as the live branch would
        def _beam_targets(tv, frames):
            out = decode_lib.teacher_beam(
                teacher, tv, frames, beam_size=kd_beam[0],
                max_steps=kd_beam[1], length_penalty=kd_beam[2])
            if teacher_beam_cache.store_consensus:
                steps = out.logits.shape[0]
                kd_all, _ = decode_lib.teacher_kd_targets(
                    out, jnp.full((out.predictions.shape[0],), steps,
                                  jnp.int32))
                return out.predictions, kd_all
            return out.predictions, None
        teacher_beam_fwd = jax.jit(_beam_targets)
    timer = StepTimer("train_step")
    epochs = max_epochs or config.train.trainer.max_epochs
    history: Dict[str, Any] = {"train_loss": [], "val_loss": []}

    set_lr = set_learning_rate

    step_rng = jax.random.PRNGKey(config.seed + 2)
    from .parallel.mesh import shard_batch
    dp = mesh.shape.get("dp", 1)

    # host-loop -> device-loop (cfg.tpu.steps_per_dispatch): one dispatch
    # scans the step over K stacked batches, removing the per-step dispatch
    # gap (docs/PERF.md §3). Single-device meshes only — stacking dp/
    # multihost-sharded batches on a new axis would change their placement.
    spd = max(1, int(getattr(config.tpu, "steps_per_dispatch", 1)))
    multi_step = None
    if spd > 1 and dp == 1 and not multihost:
        multi_step = make_train_step(
            student, teacher, tx, loss_weights,
            donate=config.tpu.donate_train_state,
            kd_beam_size=kd_beam[0], kd_max_steps=kd_beam[1],
            kd_length_penalty=kd_beam[2],
            steps_per_dispatch=spd, grad_accum=grad_accum,
            **step_cache_kwargs)

    ckpt_saver = None
    if getattr(config.train, "async_checkpointing", False):
        from .data.io import AsyncCheckpointSaver
        ckpt_saver = AsyncCheckpointSaver()


    guard = PreemptionGuard() \
        if getattr(config.train, "checkpoint_on_preemption", False) else None
    preempted = False
    try:
        for epoch in range(start_epoch, epochs):
            # resume_schedule: in the redone (preempted) epoch, the first
            # skip_batches batches already trained before the SIGTERM —
            # consume them without compute so the step sequence continues
            # exactly where the interrupted run stopped
            epoch_skip = skip_batches if epoch == start_epoch else 0
            to_skip = epoch_skip
            epoch_losses = []
            # train_loader must be re-iterable (DeviceLoader restarts per epoch).
            # Losses stay on device until epoch end: fetching a scalar per step
            # would serialize each step on a host round-trip (≈27 ms over the
            # TPU tunnel) — steps pipeline freely this way.
            epoch_t0 = time.perf_counter()
            n_steps = 0
            first_dispatch_s = 0.0
            dispatch_ms: List[float] = []
            group: List[Dict[str, Any]] = []   # pending batches for multi_step
            group_sig: Optional[tuple] = None

            def dispatch_single(arrs: Dict[str, Any]) -> None:
                """One train_step dispatch + the shared bookkeeping (timing,
                first-dispatch capture, loss/step accounting) — the single
                source of truth for every non-grouped dispatch site. On epoch
                0 the first dispatch is the jit trace+compile (execution is
                async) — captured so artifacts report steady-state step time
                separately from compile."""
                nonlocal state, n_steps, first_dispatch_s
                t_dispatch = time.perf_counter()
                state, m = train_step(state, teacher_vars, arrs, step_rng)
                dispatch_s = time.perf_counter() - t_dispatch
                if n_steps == 0:
                    first_dispatch_s = dispatch_s
                dispatch_ms.append(dispatch_s * 1e3)
                epoch_losses.append(m["total"])
                n_steps += 1
            # Cached-teacher epochs iterate through CacheReplayFeed: a producer
            # thread reads the NEXT batch's cache entries and starts their
            # host→device upload while the current step computes, so the hit
            # path pays neither disk IO nor upload latency between steps.
            feed = train_loader
            if teacher_cache is not None or teacher_beam_cache is not None:
                feed = data_teacher_cache.CacheReplayFeed(
                    train_loader, teacher_cache,
                    mesh=mesh if dp > 1 else None,
                    beam_cache=teacher_beam_cache)
            for batch in feed:
                if to_skip > 0:
                    to_skip -= 1
                    continue
                if guard is not None and guard.triggered and not multihost:
                    # single-host: stop at the step boundary; multi-host
                    # defers to the epoch barrier below so no process
                    # leaves the collectives early
                    preempted = True
                    break
                arrays = {"frames": batch["frames"], "caption": batch["caption"]}
                if teacher_cache is not None:
                    if "teacher_topk_vals" in batch:          # prefetched hit
                        arrays["teacher_topk_vals"] = batch["teacher_topk_vals"]
                        arrays["teacher_topk_idx"] = batch["teacher_topk_idx"]
                    elif "teacher_logits" in batch:           # prefetched hit
                        # fp32 both on miss and on hit: one step signature, and
                        # bf16→f32 widening is exact so losses are bitwise-stable
                        arrays["teacher_logits"] = batch["teacher_logits"]
                    else:                                     # miss: live teacher
                        keys = batch["_cache_keys"]
                        t_logits = teacher_fwd(teacher_vars, arrays["frames"],
                                               arrays["caption"])
                        dense = np.asarray(t_logits, np.float32)
                        teacher_cache.put_batch(keys, dense)
                        if teacher_cache.top_k:
                            # replay through the SAME truncated representation a
                            # hit would see, so miss- and hit-epoch losses use
                            # one distribution
                            vals, idx = teacher_cache.compress(dense)
                            arrays["teacher_topk_vals"] = jnp.asarray(vals)
                            arrays["teacher_topk_idx"] = jnp.asarray(idx)
                        else:
                            arrays["teacher_logits"] = jnp.asarray(dense)
                if teacher_beam_cache is not None:
                    if "teacher_beam_predictions" in batch:  # prefetched hit
                        arrays["teacher_beam_predictions"] = \
                            batch["teacher_beam_predictions"]
                        for k in ("teacher_kd_logits", "teacher_kd_vals",
                                  "teacher_kd_idx"):
                            if k in batch:
                                arrays[k] = batch[k]
                    else:                                     # miss: live beam
                        bkeys = batch["_beam_cache_keys"]
                        preds, kd_all = teacher_beam_fwd(teacher_vars,
                                                         arrays["frames"])
                        preds = np.asarray(preds, np.int32)
                        if teacher_beam_cache.store_consensus:
                            dense = np.asarray(kd_all, np.float32)
                            teacher_beam_cache.put_batch(bkeys, preds, dense)
                            if teacher_beam_cache.top_k:
                                # same truncated distribution on miss and hit
                                vals, idx = teacher_beam_cache.compress(dense)
                                arrays["teacher_kd_vals"] = jnp.asarray(vals)
                                arrays["teacher_kd_idx"] = jnp.asarray(idx)
                            else:
                                arrays["teacher_kd_logits"] = \
                                    jnp.asarray(dense)
                        else:
                            teacher_beam_cache.put_batch(bkeys, preds)
                        arrays["teacher_beam_predictions"] = \
                            jnp.asarray(preds)
                if multihost:
                    # arrays hold HOST-LOCAL rows (global_batch / process_count,
                    # data.dataset host_slice); assemble the logically-global
                    # dp-sharded batch without any cross-host data movement
                    from .parallel.multihost import shard_host_local_batch
                    arrays = shard_host_local_batch(arrays, mesh)
                elif dp > 1 or grad_accum > 1:
                    # A ragged tail batch must never silently change placement
                    # (replicated input → different sharding signature →
                    # recompile + a non-dp step) NOR hit the step's trace-time
                    # grad_accum divisibility error mid-training. Trim to a
                    # multiple of lcm(dp, grad_accum) instead; prefer
                    # drop_last=True loaders so this never fires.
                    quant = (dp * grad_accum) // math.gcd(dp, grad_accum)
                    bs = int(arrays["caption"].shape[0])
                    usable = (bs // quant) * quant
                    if usable == 0:
                        raise ValueError(
                            f"batch of {bs} rows cannot be split over dp={dp} "
                            f"x grad_accum={grad_accum}; raise the batch size, "
                            f"shrink the mesh's dp axis, or lower "
                            f"cfg.train.grad_accum_steps")
                    if usable != bs:
                        logger.write(f"\ntrimming ragged batch {bs} -> {usable} "
                                     f"for dp={dp}/grad_accum={grad_accum} "
                                     f"(use drop_last to avoid)\n")
                        arrays = {k: v[:usable] for k, v in arrays.items()}
                    if dp > 1:
                        arrays = shard_batch(arrays, mesh)  # dp-axis placement
                if multi_step is not None:
                    # Group key is the FULL array signature (keys, shapes,
                    # dtypes), not just the batch size: jnp.stack requires
                    # every leaf to match, and a custom loader may vary a
                    # non-leading dim (per-batch caption padding) or the
                    # teacher-cache key set mid-epoch.
                    sig = tuple(sorted(
                        (k, tuple(v.shape), str(getattr(v, "dtype", type(v))))
                        for k, v in arrays.items()))
                    if group and sig != group_sig:
                        # signature changed mid-epoch: drain the pending
                        # group as singles in arrival order, then start a NEW
                        # group at the new signature (a one-off odd batch must
                        # not disable grouping for the rest of the epoch)
                        for pending in group:
                            dispatch_single(pending)
                        group = []
                    if not group:
                        group_sig = sig
                    group.append(arrays)
                    if len(group) == spd:
                        stacked = {k: jnp.stack([g[k] for g in group])
                                   for k in group[0]}
                        group = []
                        t_dispatch = time.perf_counter()
                        state, m = multi_step(state, teacher_vars, stacked,
                                              step_rng)
                        dispatch_s = time.perf_counter() - t_dispatch
                        if n_steps == 0:
                            first_dispatch_s = dispatch_s
                        dispatch_ms.append(dispatch_s * 1e3)
                        for i in range(spd):
                            epoch_losses.append(m["total"][i])
                        n_steps += spd
                    continue
                dispatch_single(arrays)
            # epoch tail: fewer than steps_per_dispatch batches pending
            for pending in group:
                dispatch_single(pending)
            t_fetch = time.perf_counter()
            losses_np = [float(l) for l in epoch_losses]  # fetch forces completion
            fetch_s = time.perf_counter() - t_fetch
            epoch_dt = time.perf_counter() - epoch_t0
            if n_steps:
                timer.durations.append(epoch_dt / n_steps)
            history.setdefault("epoch_n_steps", []).append(n_steps)
            history.setdefault("epoch_first_dispatch_s", []).append(
                round(first_dispatch_s, 3))
            # per-step dispatch walls + trailing fetch: in a healthy pipelined
            # epoch the dispatches are milliseconds and the whole device wait
            # lands in the fetch; a fat dispatch mid-epoch is a stall (compile,
            # upload, cache miss) worth seeing in artifacts
            history.setdefault("epoch_dispatch_ms", []).append(
                [round(d, 1) for d in dispatch_ms])
            history.setdefault("epoch_fetch_s", []).append(round(fetch_s, 3))
            mean_loss = float(np.mean(losses_np)) if losses_np else 0.0
            history["train_loss"].append(mean_loss)

            if guard is not None and multihost:
                # all processes reach this collective every epoch, so a
                # flag raised on ANY host stops ALL of them here together
                preempted = _any_host_triggered(guard.triggered)
            if preempted:
                if config.train.trainer.enable_checkpointing and use_orbax \
                        and is_main:
                    if ckpt_saver is not None:
                        ckpt_saver.wait()  # earlier epochs' pending writes
                    save_checkpoint(
                        os.path.join(run_dir, "ckpt_preempt"),
                        {"params": state.params,
                         "batch_stats": state.batch_stats,
                         "opt_state": state.opt_state, "step": state.step},
                        meta={"gelu_approximate":
                              bool(config.student.gelu_approximate),
                              "preempted": True, "epoch": epoch,
                              # trained batches THIS epoch incl. ones a prior
                              # resume skipped (so resume-of-a-resume works)
                              "steps_into_epoch": epoch_skip + n_steps,
                              # scheduler state as of the last COMPLETED
                              # epoch (this epoch never reached its eval)
                              "plateau": None if use_onecycle else {
                                  "lr": sched.lr, "best": sched.best,
                                  "bad_epochs": sched.bad_epochs}})
                logger.write(
                    f"\nSIGTERM: checkpointed full train state to "
                    f"ckpt_preempt at epoch {epoch} step {int(state.step)} "
                    f"({epoch_skip + n_steps} steps into the epoch); resume "
                    f"with train(resume_from=<run_dir>/ckpt_preempt, "
                    f"resume_schedule=True) to complete the schedule\n")
                history["preempted"] = True
                break

            inference_vars = {"params": state.params,
                              "batch_stats": state.batch_stats}
            if multihost:
                # Process 0 evaluates the FULL val set on a host-local replica
                # of the (replicated) params — eval decode is latency-bound, not
                # worth a cross-host program — then broadcasts the monitored
                # value so every host's plateau scheduler stays in lockstep.
                val_bleu = _eval_on_main(
                    student, inference_vars, val_loader, tokenizer, logger,
                    epoch, "Validation", annotations,
                    config.train.eval_beam_size, is_main)
            else:
                val_bleu, _ = evaluate(student, inference_vars, val_loader,
                                       tokenizer, logger, epoch, "Validation",
                                       annotations=annotations,
                                       beam_size=config.train.eval_beam_size)
            history["val_loss"].append(val_bleu)
            if use_onecycle:
                # in-graph schedule — nothing to splice; report current lr
                new_lr = float(onecycle(int(state.step)))
            else:
                # quirk preserved: min-mode plateau on BLEU
                new_lr = sched.update(val_bleu)
                state = state.replace(
                    opt_state=set_lr(state.opt_state, new_lr))

            logger.log_scalars(epoch, {"train_loss": mean_loss,
                                       "val_loss": val_bleu, "lr": new_lr,
                                       **timer.summary()})
            if config.train.trainer.enable_checkpointing and use_orbax \
                    and is_main:
                tree = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step,
                }
                path = os.path.join(run_dir, f"ckpt_{epoch:02d}")
                prune = functools.partial(_prune_checkpoints, run_dir,
                                          config.callback.save_top_k)
                # gelu_approximate: recorded so loaders can rebuild the
                # student with the SAME activation these weights were
                # trained under (student.py::student_matching_checkpoint).
                # epoch + plateau: schedule position for resume_schedule
                # (plateau state is post-update — correct for a resume that
                # starts at epoch+1).
                meta = {"gelu_approximate":
                        bool(config.student.gelu_approximate),
                        "epoch": epoch,
                        "plateau": None if use_onecycle else {
                            "lr": sched.lr, "best": sched.best,
                            "bad_epochs": sched.bad_epochs}}
                if ckpt_saver is not None:
                    if getattr(config.tpu, "donate_train_state", False):
                        # donation invalidates these buffers at the next
                        # epoch's first step — snapshot to host SYNCHRONOUSLY
                        # and only background the disk write
                        tree = jax.device_get(tree)
                    # background fetch+write overlaps the next epoch; without
                    # donation jax arrays are immutable so the snapshot is
                    # consistent
                    ckpt_saver.save(path, tree, on_done=prune, meta=meta)
                else:
                    save_checkpoint(path, tree, meta=meta)
                    prune()
    finally:
        if guard is not None:
            guard.restore()

    if ckpt_saver is not None:
        ckpt_saver.wait()  # flush the last epoch's background write
    if preempted:
        # exit fast: the reclaim grace window is for the checkpoint, not
        # a test-set decode. val/test metrics come from the resumed run.
        history["test_loss"] = None
        history["timing"] = timer.summary()
        history["epoch_step_ms"] = [d * 1e3 for d in timer.durations]
        if teacher_cache is not None:
            history["teacher_cache"] = teacher_cache.stats()
        if teacher_beam_cache is not None:
            history["teacher_beam_cache"] = teacher_beam_cache.stats()
        logger.finish()
        return state, history
    final_vars = {"params": state.params, "batch_stats": state.batch_stats}
    if multihost:
        test_bleu = _eval_on_main(student, final_vars, test_loader, tokenizer,
                                  logger, epochs, "Test", annotations,
                                  config.train.eval_beam_size, is_main)
    else:
        test_bleu, _ = evaluate(
            student, final_vars, test_loader, tokenizer, logger, epochs,
            "Test", annotations=annotations,
            beam_size=config.train.eval_beam_size)
    history["test_loss"] = test_bleu
    history["timing"] = timer.summary()
    # one avg-step-time entry per epoch: epoch 1 vs 2 shows the
    # teacher-cache effect (miss + live teacher vs replay-only steps)
    history["epoch_step_ms"] = [d * 1e3 for d in timer.durations]
    if teacher_cache is not None:
        history["teacher_cache"] = teacher_cache.stats()
    if teacher_beam_cache is not None:
        history["teacher_beam_cache"] = teacher_beam_cache.stats()
    logger.finish()
    return state, history


def main(argv: Optional[List[str]] = None) -> None:
    """CLI entry mirroring ``python3 -m src.train`` (reference train.py:160).

    Requires the MSRVTT data layout the reference used: labels.csv with a
    ``split`` column, encoded_captions.pkl, and videos (.mp4 or .npy) under
    DATA.VIDEOS_PATH.

    ``--multihost`` (or ``cfg.tpu.multihost``): multi-process execution —
    ``jax.distributed.initialize`` runs FIRST (before any other JAX call),
    the mesh then spans every chip of every host, and this process's
    loaders decode only its slice of each global batch
    (parallel/multihost.py). The reference's whole distribution story was
    one Lightning config line (reference config.py:69); here it is one
    flag.
    """
    import argparse

    from .data.dataset import CaptionDataset, DeviceLoader, load_labels
    from .tokenization import BertWordPieceTokenizer

    parser = argparse.ArgumentParser(prog="rtvc_tpu.train")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed and train over all "
                             "hosts' devices (env: COORDINATOR_ADDRESS, "
                             "NUM_PROCESSES, PROCESS_ID; auto on TPU pods)")
    parser.add_argument("--resume", metavar="CKPT", default=None,
                        help="orbax checkpoint to restore (params, optimizer "
                             "state, step) before training")
    parser.add_argument("--resume-schedule", action="store_true",
                        help="with --resume: complete the ORIGINAL max_epochs "
                             "schedule from the checkpoint's recorded "
                             "position (a ckpt_preempt redoes the interrupted "
                             "epoch from its first untrained batch) instead "
                             "of training max_epochs more")
    args = parser.parse_args(argv)

    config = default_cfg
    multihost = False
    if args.multihost or config.tpu.multihost:
        from .parallel.multihost import initialize_distributed
        multihost = initialize_distributed()

    try:
        data, encoded = load_labels(config.data.captions_path,
                                    config.data.encoded_caption_ids)
    except FileNotFoundError as e:
        print(f"training data not found ({e}); see README for data setup",
              file=sys.stderr)
        sys.exit(1)

    host_slice = None
    if multihost:
        from .parallel.multihost import host_batch_slice
        host_slice = host_batch_slice(config.train.batch_size,
                                      jax.process_index(),
                                      jax.process_count())

    splits = {}
    for split in ("train", "validate", "test"):
        ids = data.loc[data["split"] == split, "image_id"].unique()
        # the reference seeds caption sampling for ALL splits with cfg SEED
        # (train.py:167-199) — the video→caption pairing is fixed for the
        # whole run, which also makes the teacher-output cache exact
        ds = CaptionDataset(config.data.videos_path, list(ids), data, encoded,
                            num_frames=config.data.num_frames,
                            random_state=config.seed)
        # train batches are host-sliced (each host decodes its rows of the
        # global batch); val/test loaders stay full-batch — multi-host eval
        # runs wholly on process 0 (train._eval_on_main)
        splits[split] = DeviceLoader(
            ds, config.train.batch_size, shuffle=(split == "train"),
            seed=config.seed,
            drop_last=(split == "train"),
            host_slice=host_slice if split == "train" else None)

    # the reference ran the full COCO sweep at every val/test epoch end
    # (model.py:1056 → metrics.py:16-39, reading MSR_VTT.json); mirror
    # that whenever the annotation file exists, instead of requiring the
    # caller to thread annotations= through train()
    annotations = None
    if config.data.annotation_path and \
            os.path.exists(config.data.annotation_path):
        annotations = metrics_lib.load_coco_annotations(
            config.data.annotation_path)

    tokenizer = BertWordPieceTokenizer()
    run_name = time.strftime("%y%m%d_%H%M%S")
    train(config, splits["train"], splits["validate"], splits["test"],
          tokenizer, run_name=run_name, annotations=annotations,
          resume_from=args.resume, resume_schedule=args.resume_schedule,
          teacher_cache=config.train.teacher_cache_dir or None,
          teacher_beam_cache=getattr(config.train, "teacher_beam_cache_dir",
                                     "") or None)


if __name__ == "__main__":
    main()
