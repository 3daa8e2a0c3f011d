"""Offline inference entry (reference src/inference.py:21-106).

Loads the newest checkpoint of a run, greedy-decodes ONE test batch and
prints ground truth vs predictions side by side (the reference broke after
the first batch, inference.py:58 — preserved).

CLI: ``python -m rtvc_tpu.inference <run_name>`` (reference used
``python3 -m src.inference <run_name>``, inference.py:79-82).
"""

from __future__ import annotations

import os
import sys
from typing import Iterable, List, Optional

import numpy as np

from . import decode as decode_lib
from .config import Config, cfg as default_cfg
from .data.io import latest_checkpoint, load_kd_student_params
from .models.student import (StudentCandidateV1, student_from_config,
                             student_matching_checkpoint)


def inference(config: Config, test_loader: Iterable, tokenizer,
              run_name: str, student: Optional[StudentCandidateV1] = None,
              variables=None, max_len: int = 25,
              beam_size: int = 0) -> List[str]:
    """``beam_size > 0`` decodes with the student's beam search instead of
    greedy (the reference implemented both, model.py:156-317, but its
    inference entry only exercised greedy)."""
    if variables is None:
        run_dir = os.path.join(config.logger.save_dir, "run", run_name)
        ckpt = latest_checkpoint(run_dir)
        if ckpt is None:
            raise FileNotFoundError(
                f"no checkpoint under {run_dir} (reference inference.py:30)")
        # the checkpoint's recorded activation variant wins over the config
        # default — erf-trained weights must not run under tanh GELU
        student = student or student_matching_checkpoint(config, ckpt)
        tree = load_kd_student_params(ckpt)
        variables = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
    student = student or student_from_config(config)

    preds: List[str] = []
    for batch in test_loader:
        y = np.asarray(batch["caption"])
        if beam_size > 0:
            tokens = decode_lib.student_beam(student, variables,
                                             batch["frames"],
                                             max_len=max_len, k=beam_size)
        else:
            tokens = decode_lib.student_greedy(student, variables,
                                               batch["frames"],
                                               max_len=max_len)
        tokens = np.asarray(tokens)
        caps = [tokenizer.decode(c, skip_special_tokens=True) for c in y]
        preds = [tokenizer.decode(t, skip_special_tokens=True)
                 for t in tokens]
        for gt, pred in zip(caps, preds):
            print(f"GT:   {gt}")
            print(f"Pred: {pred}")
        break  # first batch only (reference inference.py:58)
    return preds


def main(argv: Optional[List[str]] = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m rtvc_tpu.inference <run_name> [--beam K]",
              file=sys.stderr)
        sys.exit(2)
    run_name = argv[0]
    beam_size = 0
    if "--beam" in argv:
        beam_size = int(argv[argv.index("--beam") + 1])

    from .data.dataset import CaptionDataset, DeviceLoader, load_labels
    from .tokenization import BertWordPieceTokenizer

    config = default_cfg
    data, encoded = load_labels(config.data.captions_path,
                                config.data.encoded_caption_ids)
    ids = data.loc[data["split"] == "test", "image_id"].unique()
    ds = CaptionDataset(config.data.videos_path, list(ids), data, encoded,
                        num_frames=config.data.num_frames,
                        random_state=config.seed)
    loader = DeviceLoader(ds, config.train.batch_size)
    inference(config, loader, BertWordPieceTokenizer(), run_name,
              beam_size=beam_size)


if __name__ == "__main__":
    main()
