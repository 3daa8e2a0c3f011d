"""Pruned-model evaluation entry (reference src/pruning_test.py:30-173).

Loads a pruned student checkpoint and runs the test epoch only (greedy
decode + BLEU-4 + COCO sweep). Fixes the reference's latent bug where
``callback_args`` leaked from module scope into ``test()``
(pruning_test.py:89, SURVEY.md §2).
"""

from __future__ import annotations

import argparse
from typing import Iterable, Optional

from .config import Config, cfg as default_cfg
from .data.io import load_pruned_params
from .models.student import (StudentCandidateV1, student_from_config,  # noqa: F401
                             student_matching_checkpoint)
from .pruning import sparsity_report
from .train import evaluate
from .utils.logging import RunLogger


def test(config: Config, test_loader: Iterable, tokenizer, ckpt_path: str,
         student: Optional[StudentCandidateV1] = None, run_name: str = "pruned",
         annotations=None) -> float:
    # the checkpoint's recorded activation variant wins over the config
    # default (sidecar meta survives the pruning sweep)
    student = student or student_matching_checkpoint(config, ckpt_path)
    tree = load_pruned_params(ckpt_path)
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}
    report = sparsity_report(variables["params"])
    print(f"pruned model sparsity: {report['sparsity']:.3f} "
          f"({report['zeros']}/{report['total']} zeros)")

    import os
    run_dir = os.path.join(config.logger.save_dir, "run", run_name)
    logger = RunLogger(run_dir, run_name)
    bleu, _ = evaluate(student, variables, test_loader, tokenizer, logger,
                       epoch=0, split="Test", annotations=annotations)
    print(f"Test BLEU@4: {bleu}")
    return bleu


def main(argv=None) -> None:
    from .data.dataset import CaptionDataset, DeviceLoader, load_labels
    from .tokenization import BertWordPieceTokenizer

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default="results/pruned/pruned_0.5")
    args = parser.parse_args(argv)

    config = default_cfg
    data, encoded = load_labels(config.data.captions_path,
                                config.data.encoded_caption_ids)
    ids = data.loc[data["split"] == "test", "image_id"].unique()
    ds = CaptionDataset(config.data.videos_path, list(ids), data, encoded,
                        num_frames=config.data.num_frames,
                        random_state=config.seed)
    loader = DeviceLoader(ds, config.train.batch_size)
    test(config, loader, BertWordPieceTokenizer(), args.ckpt)


if __name__ == "__main__":
    main()
