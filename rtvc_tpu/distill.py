"""Knowledge-distillation losses (reference DistillationTrainer losses 1-6,
src/models/model.py:813-983), as pure functions over explicit intermediates.

The reference harvested teacher/student activations through forward hooks
(model.py:844-857); JAX has no hooks, so every loss takes the activations as
arguments — the models return them explicitly (student.forward_decoder
``return_hidden``, teacher.forward_output_logits taps).

Active training loss (model.py:983): ``kl + ce``. Losses 1/4/5/6 exist in
the reference but are dead code; they are implemented here and switchable
via ``LossWeights`` (all default 0 except kl/ce = 1, the reference's record).

Known reference bugs documented & fixed rather than replicated:
- teacher decoder hooks all bound to ONE layer via a stale loop variable
  (model.py:855-857) — here loss 6 uses a proper evenly-spaced teacher-layer
  subset;
- the dead loss-6 code compared a [2, B, S, E] student stack against a
  [4, B, T, E] teacher stack (shape-inconsistent); here student layer i maps
  to teacher layer ``round((i+1) * Lt / Ls) - 1``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Loss mixing weights; defaults = the reference's active combination.

    ``kd_source`` selects the teacher distribution for the KL term:
    - ``"teacher_forced"`` (default, the reference's active path,
      model.py:896→747-760): teacher logits from a teacher-forced forward
      over the ground-truth caption;
    - ``"beam_consensus"``: the reference's ``teacher.forward`` KD-target
      path (model.py:762-793): the teacher beam-searches a caption and, per
      generated word, the beam with the max logit for that word supplies the
      full-vocab teacher distribution (masked to generated length).
    """

    kl: float = 1.0          # loss 2 (model.py:919-928)
    ce: float = 1.0          # loss 3 (model.py:930-935)
    fmap: float = 0.0        # loss 1 (model.py:908-917, dead wrt total)
    final_enc: float = 0.0   # loss 4 (model.py:937-944, commented)
    ce_teacher: float = 0.0  # loss 5 (model.py:946-968, commented)
    decoder: float = 0.0     # loss 6 (model.py:970-980, commented)
    temperature: float = 1.0
    kd_source: str = "teacher_forced"


def kl_divergence_loss(student_logits: jnp.ndarray,
                       teacher_logits: jnp.ndarray,
                       temperature: float = 1.0) -> jnp.ndarray:
    """torch ``KLDivLoss(reduction='batchmean')(log_softmax(s), softmax(t))``
    semantics (model.py:819,919-928): sum of elementwise KL divided by the
    BATCH size (dim 0) only, scaled by T^2. No padding mask — the reference
    includes padded positions, preserved for loss parity."""
    s = student_logits.astype(jnp.float32) / temperature
    t = teacher_logits.astype(jnp.float32) / temperature
    log_p_s = jax.nn.log_softmax(s, axis=-1)
    p_t = jax.nn.softmax(t, axis=-1)
    log_p_t = jax.nn.log_softmax(t, axis=-1)
    kl = jnp.sum(p_t * (log_p_t - log_p_s))
    return (kl / student_logits.shape[0]) * (temperature ** 2)


def masked_kl_divergence_loss(student_logits: jnp.ndarray,
                              teacher_logits: jnp.ndarray,
                              valid: jnp.ndarray,
                              temperature: float = 1.0) -> jnp.ndarray:
    """KL over a position mask, batchmean-style (sum / batch-size) — used by
    the beam-consensus KD mode where only the teacher's actually-generated
    word positions carry a distribution (reference model.py:774-789)."""
    s = student_logits.astype(jnp.float32) / temperature
    t = teacher_logits.astype(jnp.float32) / temperature
    log_p_s = jax.nn.log_softmax(s, axis=-1)
    p_t = jax.nn.softmax(t, axis=-1)
    log_p_t = jax.nn.log_softmax(t, axis=-1)
    kl = jnp.sum(p_t * (log_p_t - log_p_s), axis=-1)   # [B, S]
    kl = jnp.sum(kl * valid.astype(jnp.float32))
    return (kl / student_logits.shape[0]) * (temperature ** 2)


def cross_entropy_loss(student_logits: jnp.ndarray, targets: jnp.ndarray,
                       ignore_index: int = 0) -> jnp.ndarray:
    """Shifted CE vs ground truth (model.py:930-935): predict y[:, 1:] from
    logits[:, :-1], ignore_index=0, mean over non-ignored tokens."""
    logits = student_logits[:, :-1].astype(jnp.float32)
    tgt = targets[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (tgt != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def fmap_distillation_loss(student_proj_means: Sequence[jnp.ndarray],
                           teacher_cls_taps: Sequence[jnp.ndarray]
                           ) -> jnp.ndarray:
    """Loss 1 (model.py:908-917): MSE between the four projected student
    stage means [B*F, 1024] and teacher CLS tokens at encoder blocks
    [0, 6, 12, 18] reshaped to [B*F, 1024]."""
    s = jnp.stack([p.astype(jnp.float32) for p in student_proj_means])
    t = jnp.stack([tap.reshape(-1, tap.shape[-1]).astype(jnp.float32)
                   for tap in teacher_cls_taps])
    return jnp.mean((s - t) ** 2)


def final_encoding_loss(student_visual: jnp.ndarray,
                        teacher_visual: jnp.ndarray) -> jnp.ndarray:
    """Loss 4 (dead in reference, model.py:937-944): MSE between the
    upsample+project student memory [B, 1542, 1024] and teacher visual
    features [B, 1542, 1024]."""
    return jnp.mean((student_visual.astype(jnp.float32)
                     - teacher_visual.astype(jnp.float32)) ** 2)


def teacher_token_ce_loss(student_logits: jnp.ndarray,
                          teacher_tokens: jnp.ndarray) -> jnp.ndarray:
    """Loss 5 (dead, model.py:946-968): CE of student logits vs the
    teacher's generated tokens, truncated/padded (with SEP=102) to the
    student length — no ignore_index (reference used plain CE)."""
    logits = student_logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, teacher_tokens[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def decoder_distillation_loss(student_hidden_proj: Sequence[jnp.ndarray],
                              teacher_hidden: Sequence[jnp.ndarray],
                              prefix_len: int) -> jnp.ndarray:
    """Loss 6 (dead+buggy in reference, model.py:970-980): MSE between each
    projected student decoder layer output [B, T, 768] and an evenly-spaced
    teacher decoder layer's TEXT positions (teacher hidden is [B, P+T, 768];
    text starts at prefix_len=1542)."""
    ls, lt = len(student_hidden_proj), len(teacher_hidden)
    total = jnp.float32(0.0)
    for i, s in enumerate(student_hidden_proj):
        j = max(0, round((i + 1) * lt / ls) - 1)
        t = teacher_hidden[j][:, prefix_len:prefix_len + s.shape[1]]
        total = total + jnp.mean((s.astype(jnp.float32)
                                  - t.astype(jnp.float32)) ** 2)
    return total / ls


def _require(cond: bool, loss_name: str, what: str) -> None:
    if not cond:
        raise ValueError(
            f"LossWeights.{loss_name} is non-zero but {what} was not "
            f"provided — a weighted loss must never be a silent no-op")


def distillation_losses(
    *,
    student_logits: jnp.ndarray,
    teacher_logits: Optional[jnp.ndarray],
    targets: jnp.ndarray,
    weights: LossWeights = LossWeights(),
    student_proj_means: Optional[Sequence[jnp.ndarray]] = None,
    teacher_cls_taps: Optional[Sequence[jnp.ndarray]] = None,
    student_visual: Optional[jnp.ndarray] = None,
    teacher_visual: Optional[jnp.ndarray] = None,
    teacher_tokens: Optional[jnp.ndarray] = None,
    teacher_kd_logits: Optional[jnp.ndarray] = None,
    teacher_kd_valid: Optional[jnp.ndarray] = None,
    student_hidden_proj: Optional[Sequence[jnp.ndarray]] = None,
    teacher_hidden: Optional[Sequence[jnp.ndarray]] = None,
    teacher_prefix_len: int = 1542,
) -> Dict[str, jnp.ndarray]:
    """Compute all requested losses; ``total`` uses the configured weights
    (reference record: total = kl + ce, model.py:983).

    Every weighted loss whose inputs are missing raises — by design no
    configured loss can silently drop out of the total."""
    w = weights
    out: Dict[str, jnp.ndarray] = {}
    if w.kd_source == "beam_consensus":
        _require(teacher_kd_logits is not None and teacher_kd_valid is not None,
                 "kd_source='beam_consensus'", "teacher_kd_logits/valid")
        s = teacher_kd_logits.shape[1]
        out["kl"] = masked_kl_divergence_loss(
            student_logits[:, :s], teacher_kd_logits, teacher_kd_valid,
            w.temperature)
    else:
        if w.kd_source != "teacher_forced":
            raise ValueError(f"unknown kd_source {w.kd_source!r}")
        _require(teacher_logits is not None, "kl", "teacher_logits")
        out["kl"] = kl_divergence_loss(student_logits, teacher_logits,
                                       w.temperature)
    out["ce"] = cross_entropy_loss(student_logits, targets)
    total = w.kl * out["kl"] + w.ce * out["ce"]
    if w.fmap:
        _require(student_proj_means is not None and teacher_cls_taps
                 is not None, "fmap", "student_proj_means/teacher_cls_taps")
        out["fmap"] = fmap_distillation_loss(student_proj_means,
                                             teacher_cls_taps)
        total = total + w.fmap * out["fmap"]
    if w.final_enc:
        _require(student_visual is not None and teacher_visual is not None,
                 "final_enc", "student_visual/teacher_visual")
        out["final_enc"] = final_encoding_loss(student_visual, teacher_visual)
        total = total + w.final_enc * out["final_enc"]
    if w.ce_teacher:
        _require(teacher_tokens is not None, "ce_teacher", "teacher_tokens")
        out["ce_teacher"] = teacher_token_ce_loss(student_logits,
                                                  teacher_tokens)
        total = total + w.ce_teacher * out["ce_teacher"]
    if w.decoder:
        _require(student_hidden_proj is not None and teacher_hidden
                 is not None, "decoder", "student_hidden_proj/teacher_hidden")
        out["decoder"] = decoder_distillation_loss(
            student_hidden_proj, teacher_hidden, teacher_prefix_len)
        total = total + w.decoder * out["decoder"]
    out["total"] = total
    return out
