"""Full synthetic end-to-end chain, recorded as an artifact (VERDICT #6/#8).

Runs, at FULL model size on the current backend, the complete reference
workflow (reference train.py:145-152 -> trainer.test, then the pruning
pipeline) against the synthetic MSRVTT tree from make_synthetic_data.py:

  train (3 epochs, teacher-logit cache on) -> resume (+1 epoch)
  -> inference entry -> pruning sweep -> pruning_test

and writes results/SMOKE_E2E.md with the per-epoch step-time table (the
teacher-cache effect: epoch 1 pays the live teacher, epochs 2+ replay
logits from disk) plus COCO metric sweeps, ending with one JSON line.

Usage: python scripts/smoke_e2e.py  (~30-45 min cold on the TPU tunnel)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import rtvc_tpu  # noqa: F401  (compile cache)
    from rtvc_tpu import inference as inference_mod
    from rtvc_tpu import pruning as pruning_mod
    from rtvc_tpu import pruning_test as pruning_test_mod
    from rtvc_tpu import train as train_mod
    from rtvc_tpu.config import cfg as config
    from rtvc_tpu.data.dataset import CaptionDataset, DeviceLoader, load_labels
    from rtvc_tpu.data.io import latest_checkpoint
    from rtvc_tpu.metrics import load_coco_annotations
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    top_k = 0
    if "--topk" in sys.argv:
        top_k = int(sys.argv[sys.argv.index("--topk") + 1])
        config = dataclasses.replace(config, train=dataclasses.replace(
            config.train, teacher_cache_top_k=top_k))
    run_name = "smoke_e2e" + (f"_topk{top_k}" if top_k else "")
    run_dir = os.path.join(config.logger.save_dir, "run", run_name)
    cache_dir = os.path.join(run_dir, "teacher_cache")
    report = {"run": run_name, "cache_top_k": top_k}
    wall0 = time.perf_counter()

    data, encoded = load_labels(config.data.captions_path,
                                config.data.encoded_caption_ids)
    loaders = {}
    for split in ("train", "validate", "test"):
        ids = data.loc[data["split"] == split, "image_id"].unique()
        ds = CaptionDataset(config.data.videos_path, list(ids), data, encoded,
                            num_frames=config.data.num_frames,
                            random_state=config.seed)
        # shuffle=False even for train: the synthetic split (12 videos,
        # batch 8, drop_last) would otherwise put a different 8-video
        # subset in each epoch's single batch, and the all-or-nothing
        # batch lookup of the teacher cache would never hit. At real
        # MSRVTT scale every pair is cached during epoch 1 regardless of
        # shuffling; tiny-split smoke needs fixed composition to show the
        # steady-state hit path.
        loaders[split] = DeviceLoader(ds, config.train.batch_size,
                                      shuffle=False, seed=config.seed,
                                      drop_last=(split == "train"))
    annotations = load_coco_annotations(config.data.annotation_path)
    tokenizer = BertWordPieceTokenizer()

    # ---- 1. train: 3 epochs with the teacher-logit disk cache ------------
    t0 = time.perf_counter()
    state, history = train_mod.train(
        config, loaders["train"], loaders["validate"], loaders["test"],
        tokenizer, run_name=run_name, annotations=annotations,
        max_epochs=4, teacher_cache=cache_dir)
    report["train_wall_s"] = round(time.perf_counter() - t0, 1)
    report["epoch_step_ms"] = [round(x, 1) for x in history["epoch_step_ms"]]
    report["epoch_n_steps"] = history["epoch_n_steps"]
    report["epoch_first_dispatch_s"] = history["epoch_first_dispatch_s"]
    report["teacher_cache"] = history.get("teacher_cache")
    report["train_loss"] = [round(x, 4) for x in history["train_loss"]]
    print(f"[train] per-epoch avg step ms: {report['epoch_step_ms']} "
          f"cache: {report['teacher_cache']}")

    # ---- 2. resume from the saved checkpoint, one more epoch -------------
    ckpt = latest_checkpoint(run_dir)
    assert ckpt is not None, f"no checkpoint written under {run_dir}"
    t0 = time.perf_counter()
    state2, history2 = train_mod.train(
        config, loaders["train"], loaders["validate"], loaders["test"],
        tokenizer, run_name=run_name + "_resumed", annotations=annotations,
        max_epochs=1, teacher_cache=cache_dir, resume_from=ckpt)
    report["resume_wall_s"] = round(time.perf_counter() - t0, 1)
    report["resume_step"] = int(state2.step)
    assert int(state2.step) > int(state.step) - 1, "resume did not continue"
    print(f"[resume] continued to step {report['resume_step']}")

    # ---- 3. inference entry ---------------------------------------------
    t0 = time.perf_counter()
    preds = inference_mod.inference(config, loaders["test"], tokenizer,
                                    run_name)
    report["inference_wall_s"] = round(time.perf_counter() - t0, 1)
    report["inference_preds"] = len(preds)

    # ---- 3b. standalone evaluation entry ---------------------------------
    # full COCO sweep over the trained checkpoint via the evaluate CLI's
    # API (the reference could only get this inside a training run)
    from rtvc_tpu.evaluate import evaluate_checkpoint
    t0 = time.perf_counter()
    scores, outputs = evaluate_checkpoint(
        config, loaders["test"], tokenizer, ckpt=ckpt, split="test",
        annotations=annotations)
    report["evaluate_wall_s"] = round(time.perf_counter() - t0, 1)
    report["evaluate_scores"] = {k: round(v, 4) for k, v in scores.items()}
    report["evaluate_n"] = len(outputs)
    print(f"[evaluate] {report['evaluate_scores']}")

    # ---- 4. pruning sweep + pruned eval ---------------------------------
    t0 = time.perf_counter()
    pruning_mod.main(["--ckpt", ckpt, "--out_dir", "results/pruned",
                      "--ratios", "0.1", "0.3", "0.5"])
    report["pruning_wall_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pruning_test_mod.main(["--ckpt", "results/pruned/pruned_0.5"])
    report["pruning_test_wall_s"] = round(time.perf_counter() - t0, 1)

    report["total_wall_s"] = round(time.perf_counter() - wall0, 1)

    # ---- 5. record the artifact -----------------------------------------
    os.makedirs("results", exist_ok=True)
    out_md = "results/SMOKE_E2E" + (f"_topk{top_k}" if top_k else "") + ".md"
    with open(out_md, "w") as f:
        f.write("# Synthetic end-to-end chain (full-size models)\n\n")
        f.write("Chain: train(4 epochs, teacher-cache) -> resume(+1) -> "
                "inference -> evaluate (standalone COCO sweep) -> "
                "pruning sweep 0.1/0.3/0.5 -> pruning_test.\n\n")
        f.write("Per-epoch step time, with the one-time jit compile (the\n"
                "epoch's first dispatch) separated out so the steady-state\n"
                "column is comparable across epochs; epoch 0 additionally\n"
                "pays the LIVE teacher per step (cache misses), epochs 1+\n"
                "replay cached teacher logits:\n\n")
        f.write("| epoch | steps | first dispatch s (compile) | "
                "avg step ms (incl.) | avg step ms (excl. first) |\n"
                "|---|---|---|---|---|\n")
        for i, ms in enumerate(report["epoch_step_ms"]):
            n = report["epoch_n_steps"][i]
            fd = report["epoch_first_dispatch_s"][i]
            excl = ((ms * n / 1e3 - fd) / max(n - 1, 1)) * 1e3
            note = " (live teacher)" if i == 0 else " (cached replay)"
            f.write(f"| {i}{note} | {n} | {fd} | {ms} | {excl:.1f} |\n")
        f.write(f"\nteacher cache: {report['teacher_cache']}\n\n")
        f.write(f"train losses: {report['train_loss']}\n\n")
        f.write(f"standalone evaluate (test split, {report['evaluate_n']} "
                f"videos): {json.dumps(report['evaluate_scores'])}\n\n")
        f.write("wall times (s): " + json.dumps(
            {k: v for k, v in report.items() if k.endswith('_wall_s')})
            + "\n")
        f.write("\n(epoch walls = steps x avg-step; train_wall_s "
                "additionally includes state init/compile before the loop "
                "and the per-epoch eval decodes.)\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
