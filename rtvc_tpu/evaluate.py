"""Standalone checkpoint evaluation — the full COCO metric sweep on demand.

The reference computed its metric sweep only INSIDE training (epoch-end
``calculate_score``, reference src/models/model.py:1040-1060 via
src/metrics.py:16-39); scoring an already-trained checkpoint meant
re-running training. This entry loads any checkpoint, decodes the chosen
split (greedy, or beam via ``--beam K``) and reports the reference's full
metric set — BLEU-1..4, METEOR, ROUGE_L, CIDEr ×100 — plus its corpus
BLEU-4 (src/metrics.py:42-68), as one JSON object.

CLI::

    python -m rtvc_tpu.evaluate <run_name> [--ckpt PATH] [--split test]
        [--beam K] [--out scores.json] [--annotations MSR_VTT.json]
        [--verbose]

``<run_name>`` resolves the newest checkpoint under
``<save_dir>/run/<run_name>`` exactly like ``rtvc_tpu.inference``;
``--ckpt`` points at a specific checkpoint directory instead (e.g. a
pruned model or a ``ckpt_preempt``).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, Iterable, List, Optional, Tuple

from . import metrics as metrics_lib
from .config import Config, cfg as default_cfg
from .data.io import latest_checkpoint, load_kd_student_params
from .models.student import (StudentCandidateV1,
                             student_matching_checkpoint)


def evaluate_checkpoint(config: Config, loader: Iterable, tokenizer,
                        run_name: Optional[str] = None,
                        ckpt: Optional[str] = None,
                        split: str = "test",
                        beam_size: int = 0,
                        annotations: Optional[Dict[str, List[str]]] = None,
                        student: Optional[StudentCandidateV1] = None,
                        variables=None,
                        max_len_extra: int = 5,
                        verbose: bool = False,
                        ) -> Tuple[Dict[str, float], List[dict]]:
    """Score one checkpoint on one split.

    Returns ``(scores, outputs)``: ``scores`` holds ``corpus_bleu4`` (the
    reference's per-epoch monitor, ×100) and — when ``annotations`` maps
    image_id → reference captions — the COCO sweep ×100 under the
    reference's metric names; ``outputs`` is the COCO-format
    ``[{image_id, caption}]`` prediction list (what the reference dumped
    to validation_preds.json).
    """
    if variables is None:
        if ckpt is None:
            if run_name is None:
                raise ValueError("need run_name, ckpt, or variables")
            run_dir = os.path.join(config.logger.save_dir, "run", run_name)
            ckpt = latest_checkpoint(run_dir)
            if ckpt is None:
                raise FileNotFoundError(f"no checkpoint under {run_dir}")
        # the checkpoint's recorded activation variant wins over the config
        # default (same rule as inference.py) — erf-trained weights must
        # not run under tanh GELU
        student = student or student_matching_checkpoint(config, ckpt)
        tree = load_kd_student_params(ckpt)
        variables = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
    if student is None:
        raise ValueError("pass student= alongside variables=")

    from .train import _NullLogger, evaluate
    bleu4, outputs = evaluate(student, variables, loader, tokenizer,
                              _NullLogger(), epoch=0, split=split,
                              max_len_extra=max_len_extra,
                              annotations=None, verbose=verbose,
                              beam_size=beam_size)
    scores: Dict[str, float] = {"corpus_bleu4": float(bleu4)}
    if annotations:
        raw = metrics_lib.evaluate_captions(outputs, annotations)
        scores.update({k: v * 100 for k, v in raw.items()})
    return scores, outputs


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    from .data.dataset import CaptionDataset, DeviceLoader, load_labels
    from .tokenization import BertWordPieceTokenizer

    parser = argparse.ArgumentParser(prog="rtvc_tpu.evaluate")
    parser.add_argument("run_name", nargs="?", default=None,
                        help="run whose newest checkpoint to score "
                             "(under <save_dir>/run/<run_name>)")
    parser.add_argument("--ckpt", default=None,
                        help="explicit checkpoint directory (overrides "
                             "run_name resolution)")
    parser.add_argument("--split", default="test",
                        choices=("train", "validate", "test"))
    parser.add_argument("--beam", type=int, default=0,
                        help="beam size (0 = greedy, the reference's "
                             "eval decode)")
    parser.add_argument("--annotations", default=None,
                        help="MSR_VTT.json-format COCO annotation file "
                             "(default: cfg.data.annotation_path if it "
                             "exists; without it only corpus BLEU-4 runs)")
    parser.add_argument("--out", default=None,
                        help="write the scores JSON here (and the "
                             "COCO-format predictions next to it as "
                             "<out>.preds.json)")
    parser.add_argument("--verbose", action="store_true",
                        help="print per-batch GT/prediction transcripts")
    args = parser.parse_args(argv)
    if args.run_name is None and args.ckpt is None:
        parser.error("need a run_name or --ckpt")

    config = default_cfg
    try:
        data, encoded = load_labels(config.data.captions_path,
                                    config.data.encoded_caption_ids)
    except FileNotFoundError as e:
        print(f"evaluation data not found ({e}); see README for data setup",
              file=sys.stderr)
        sys.exit(1)
    ids = data.loc[data["split"] == args.split, "image_id"].unique()
    ds = CaptionDataset(config.data.videos_path, list(ids), data, encoded,
                        num_frames=config.data.num_frames,
                        random_state=config.seed)
    loader = DeviceLoader(ds, config.train.batch_size)

    ann_path = args.annotations or config.data.annotation_path
    annotations = None
    if ann_path and os.path.exists(ann_path):
        annotations = metrics_lib.load_coco_annotations(ann_path)
    elif args.annotations:  # explicitly requested but absent: hard error
        print(f"annotation file not found: {args.annotations}",
              file=sys.stderr)
        sys.exit(1)
    else:
        print(f"no annotation file at {ann_path!r}; reporting corpus "
              f"BLEU-4 only", file=sys.stderr)

    scores, outputs = evaluate_checkpoint(
        config, loader, BertWordPieceTokenizer(),
        run_name=args.run_name, ckpt=args.ckpt, split=args.split,
        beam_size=args.beam, annotations=annotations, verbose=args.verbose)
    print(json.dumps(scores))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(scores, f)
        with open(args.out + ".preds.json", "w") as f:
            json.dump(outputs, f)


if __name__ == "__main__":
    main()
