"""Flagship-size memorization run: prove the full training graph LEARNS.

VERDICT r4 #1: every prior artifact showed loss decreasing, but nothing
showed the full 65.83M-param training graph — fused-attention VJP at
flagship shapes, BatchNorm stats, plateau machinery, teacher replay cache,
KV-cached greedy decode, and the metric sweep in concert — actually driving
captions to memorization. A gradient bug that merely shrinks loss without
producing language would pass every other test. This run closes that hole
offline (no real weights needed): train the flagship student on a tiny
corpus of DISTINCT captions until greedy decode reproduces them verbatim.

What it does:

1. Builds a 12-clip corpus (seeded noise videos, so each clip is a fixed
   distinguishable pattern) with 12 distinct real-word captions encoded
   [CLS] + WordPiece ids + [SEP]. Unlike the reference's raw
   ``encode_caption`` (no SEP, reference src/utils/tokenizer.py:25) the
   memorization targets ARE SEP-terminated — that is a property of the
   data, not the code, and it lets greedy decode demonstrate the full
   stop semantics (all-rows-SEP, reference model.py:184) and emit the
   caption text EXACTLY (a no-SEP target never teaches the model to
   stop, so decode would trail garbage to max_len even when memorized).
2. Runs the REAL training entry (`rtvc_tpu.train.train`): default
   flagship student config, KL+CE loss (the reference's active
   combination, model.py:983) against the frozen random-init teacher,
   teacher-forced logits replayed from the disk cache after epoch 0,
   per-epoch greedy-decode eval, plateau scheduler machinery live (its
   patience is set huge: the preserved reference quirk monitors BLEU in
   MIN mode — reference model.py:1105-1113 — which on a thousands-of-
   epoch memorization run would anneal the LR to min_lr; the reference's
   own 20-epoch schedule fires it at most twice).
3. After training: greedy-decodes the train split, counts captions
   reproduced VERBATIM, runs the standalone COCO sweep
   (rtvc_tpu.evaluate API) on the train split, and writes
   results/memorize_flagship/report.json. docs/LEARNING.md records the
   outcome.

Usage:
  python scripts/memorize_flagship.py [--epochs 700] [--batch 4]
      [--lr 1e-4] [--clips 12] [--root results/memorize_flagship]

Device cost: ~2.5k replay steps at ~35-50 ms each (docs/PERF.md §3) plus
one decode per epoch — minutes of device time; wall is tunnel-bound.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 12 distinct captions over the synthetic vocab's whole-word list
# (tokenization/vocab.py _CORE_WORDS) so text -> ids -> text round-trips.
CAPTIONS = [
    "a man is playing guitar on stage",
    "two dogs are running in the park",
    "a woman is cooking food in the kitchen",
    "people are dancing at night",
    "a cat is sitting on the table",
    "a group of people are singing a song",
    "a boy is riding a bike down the street",
    "an old man is talking to the camera",
    "a horse is jumping in the field",
    "a girl is swimming in the ocean",
    "the team is playing soccer on the grass",
    "a bird is flying over the water",
]


def build_corpus(root: str, tokenizer, n_clips: int, seed: int = 0):
    """Synthetic MSRVTT-layout tree with per-video distinct captions.

    Same file layout as scripts/make_synthetic_data.py (the exact layout
    the reference training entry consumed, reference train.py:170-176);
    every video carries ONE caption, present in all three splits (val =
    first 4 train videos, test = all), so the per-epoch val decode and the
    final train-split sweep both measure memorization of the same targets.
    """
    import numpy as np
    import pandas as pd

    assert n_clips <= len(CAPTIONS)
    vids_dir = os.path.join(root, "videos")
    os.makedirs(vids_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows, encoded, ann = [], {}, []
    cap_id = 0
    for i in range(n_clips):
        vid = f"memo{i}"
        np.save(os.path.join(vids_dir, vid + ".npy"),
                rng.integers(0, 255, size=(18, 120, 160, 3), dtype=np.uint8))
        text = CAPTIONS[i]
        ids = [101] + tokenizer.encode(text) + [102]
        assert tokenizer.decode(ids, skip_special_tokens=True) == text, text
        splits = ["train"] + (["validate"] if i < 4 else []) + ["test"]
        for split in splits:
            rows.append({"image_id": vid, "id": cap_id, "caption": text,
                         "split": split})
            encoded[cap_id] = list(ids)
            cap_id += 1
        ann.append({"image_id": vid, "caption": text})
    pd.DataFrame(rows).to_csv(os.path.join(root, "labels.csv"), index=False)
    import pickle
    with open(os.path.join(root, "encoded_captions.pkl"), "wb") as f:
        pickle.dump(encoded, f)
    with open(os.path.join(root, "annotations.json"), "w") as f:
        json.dump({"annotations": ann,
                   "images": [{"id": f"memo{i}"} for i in range(n_clips)]},
                  f)
    return vids_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=700)
    p.add_argument("--batch", type=int, default=4,
                   help="4 -> 3 steps/epoch over 12 clips (drop_last); the "
                        "flagship batch 8 would train only 8 of 12 per epoch")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clips", type=int, default=12)
    p.add_argument("--root", default="results/memorize_flagship")
    p.add_argument("--kl", type=float, default=1.0,
                   help="KL weight. The default run keeps the reference's "
                        "active kl+ce combination; note the KL target here "
                        "is a RANDOM-init teacher, i.e. an adversarial "
                        "noise prior the real run never has — --kl 0.1 "
                        "records the ablation where CE dominates")
    p.add_argument("--ce", type=float, default=1.0)
    args = p.parse_args()

    import numpy as np

    import rtvc_tpu  # noqa: F401  (compile cache)
    import jax
    from rtvc_tpu import decode as decode_lib
    from rtvc_tpu import train as train_mod
    from rtvc_tpu.config import cfg
    from rtvc_tpu.data.dataset import CaptionDataset, DeviceLoader, \
        load_labels
    from rtvc_tpu.metrics import evaluate_captions, load_coco_annotations
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    os.makedirs(args.root, exist_ok=True)
    tokenizer = BertWordPieceTokenizer()
    videos_path = build_corpus(args.root, tokenizer, args.clips)
    print(f"corpus: {args.clips} clips, {args.clips} distinct captions "
          f"under {args.root}", flush=True)

    config = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, videos_path=videos_path,
            captions_path=os.path.join(args.root, "labels.csv"),
            encoded_caption_ids=os.path.join(args.root,
                                             "encoded_captions.pkl"),
            annotation_path=os.path.join(args.root, "annotations.json")),
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch, lr=args.lr,
            teacher_cache_top_k=128,   # ~240x smaller replay uploads;
                                       # deterministic truncated KL target
            plateau_patience=10 ** 9,  # see module docstring
            async_checkpointing=False,
            trainer=dataclasses.replace(cfg.train.trainer,
                                        max_epochs=args.epochs,
                                        enable_checkpointing=False)),
        logger=dataclasses.replace(cfg.logger, save_dir=args.root))

    data, encoded = load_labels(config.data.captions_path,
                                config.data.encoded_caption_ids)
    loaders = {}
    for split in ("train", "validate", "test"):
        ids = data.loc[data["split"] == split, "image_id"].unique()
        ds = CaptionDataset(config.data.videos_path, list(ids), data,
                            encoded, num_frames=config.data.num_frames,
                            random_state=config.seed)
        loaders[split] = DeviceLoader(ds, config.train.batch_size,
                                      shuffle=(split == "train"),
                                      seed=config.seed,
                                      drop_last=(split == "train"))

    from rtvc_tpu.distill import LossWeights
    cache_dir = os.path.join(args.root, "teacher_cache")
    t0 = time.perf_counter()
    state, history = train_mod.train(
        config, loaders["train"], loaders["validate"], loaders["test"],
        tokenizer, run_name="memorize", annotations=None,
        loss_weights=LossWeights(kl=args.kl, ce=args.ce),
        max_epochs=args.epochs, teacher_cache=cache_dir)
    train_wall = time.perf_counter() - t0
    print(f"train: {args.epochs} epochs "
          f"({history['epoch_n_steps'][0]} steps/epoch) in "
          f"{train_wall:.0f}s; cache {history.get('teacher_cache')}",
          flush=True)

    # ---- teacher-forced next-token probe ---------------------------------
    # Separates "the loss never taught X" from "greedy decode fails to emit
    # a learned X": argmax of the TEACHER-FORCED logits at every non-pad
    # target position, reported overall and at the SEP position
    # specifically (the stop token greedy decode depends on).
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    student = train_mod.student_from_config(config)
    import jax.numpy as jnp  # noqa: E402

    forced = jax.jit(lambda v, f, y: student.apply(v, f, y, train=False)[-1])
    n_ok = n_tok = 0
    sep_rows = []
    for batch in loaders["train"]:
        y = np.asarray(batch["caption"])
        logits = np.asarray(forced(variables, batch["frames"],
                                   jnp.asarray(y)))
        pred = logits[:, :-1].argmax(-1)
        tgt = y[:, 1:]
        mask = tgt != 0
        n_ok += int((pred == tgt)[mask].sum())
        n_tok += int(mask.sum())
        for r in range(y.shape[0]):
            sep_pos = np.nonzero(tgt[r] == 102)[0]
            if sep_pos.size:
                j = int(sep_pos[0])
                row = logits[r, j]
                probs = np.exp(row - row.max())
                probs /= probs.sum()
                top2 = np.argsort(row)[-2:][::-1]
                sep_rows.append({
                    "pred_at_sep": int(pred[r, j]),
                    "p_sep": round(float(probs[102]), 4),
                    "runner_up": int(top2[1] if top2[0] == 102 else top2[0]),
                    "p_runner_up": round(float(
                        probs[top2[1] if top2[0] == 102 else top2[0]]), 4)})
    sep_hits = sum(r["pred_at_sep"] == 102 for r in sep_rows)
    forced_acc = n_ok / max(n_tok, 1)
    print(f"teacher-forced next-token acc: {forced_acc:.3f} "
          f"({n_ok}/{n_tok}); SEP argmax at SEP position: "
          f"{sep_hits}/{len(sep_rows)} "
          f"(mean p_sep {np.mean([r['p_sep'] for r in sep_rows]):.4f}, "
          f"mean runner-up p "
          f"{np.mean([r['p_runner_up'] for r in sep_rows]):.4f})",
          flush=True)

    # persist the trained state — the reference's entire deliverable is a
    # trained checkpoint (reference train.py:145-152), and post-hoc decode
    # probes need it
    from rtvc_tpu.data.io import save_checkpoint
    ckpt_path = os.path.join(os.path.abspath(args.root), "ckpt_final")
    save_checkpoint(ckpt_path, {"params": state.params,
                                "batch_stats": state.batch_stats})
    print(f"checkpoint: {ckpt_path}", flush=True)

    # ---- verbatim memorization check over the train split ---------------
    results, outputs = [], []
    for batch in loaders["train"]:
        y = np.asarray(batch["caption"])
        toks = np.asarray(decode_lib.student_greedy(
            student, variables,
            batch["frames"], max_len=int(y.shape[-1]) + 5))
        for row, gt_row, vid in zip(toks, y, batch["vid-id"]):
            # per-row truncation at the first SEP — the all-rows-SEP early
            # stop leaves garbage after an early-finishing row's SEP; this
            # is the serving exactness contract (serving.py module doc)
            sep = np.nonzero(row == 102)[0]
            if sep.size:
                row = row[:int(sep[0]) + 1]
            pred = tokenizer.decode(row, skip_special_tokens=True)
            gt = tokenizer.decode(gt_row, skip_special_tokens=True)
            results.append({"vid": str(vid), "gt": gt, "pred": pred,
                            "verbatim": pred == gt})
            outputs.append({"image_id": str(vid), "caption": pred})
    n_verbatim = sum(r["verbatim"] for r in results)
    for r in sorted(results, key=lambda r: r["vid"]):
        mark = "OK " if r["verbatim"] else "MISS"
        print(f"  [{mark}] {r['vid']}: gt='{r['gt']}' pred='{r['pred']}'",
              flush=True)
    print(f"memorized verbatim: {n_verbatim}/{len(results)}", flush=True)

    # ---- train-split COCO sweep (the standalone evaluate API) -----------
    annotations = load_coco_annotations(config.data.annotation_path)
    scores = evaluate_captions(outputs, annotations)
    scores = {k: round(v * 100, 2) for k, v in scores.items()}
    print(f"train-split COCO sweep: {scores}", flush=True)

    report = {
        "epochs": args.epochs, "batch": args.batch, "lr": args.lr,
        "clips": args.clips, "kl": args.kl, "ce": args.ce,
        "forced_next_token_acc": round(forced_acc, 4),
        "sep_argmax_hits": sep_hits, "sep_rows": sep_rows,
        "steps": int(state.step),
        "train_wall_s": round(train_wall, 1),
        "train_loss_first": round(history["train_loss"][0], 4),
        "train_loss_last": round(history["train_loss"][-1], 4),
        "train_loss_curve": [round(x, 4) for x in history["train_loss"]],
        "val_bleu_curve": [round(x, 2) for x in history["val_loss"]],
        "teacher_cache": history.get("teacher_cache"),
        "epoch_step_ms_mean": round(float(np.mean(
            history["epoch_step_ms"][1:] or history["epoch_step_ms"])), 1),
        "n_verbatim": n_verbatim, "n_total": len(results),
        "captions": results, "coco": scores,
    }
    out = os.path.join(args.root, "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("steps", "train_loss_first", "train_loss_last",
                       "n_verbatim", "n_total", "coco", "train_wall_s")}),
          flush=True)
    print(f"report: {out}", flush=True)


if __name__ == "__main__":
    main()
