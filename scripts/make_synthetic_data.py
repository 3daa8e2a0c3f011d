"""Generate a synthetic MSRVTT-format data tree for smoke runs/verification.

Creates under ``data/``: labels.csv (image_id,id,caption,split),
encoded_captions.pkl, 20 .npy clips under MSRVTT/videos/all, and a
COCO-format MSR_VTT.json — the exact layout the reference training entry
consumed (reference train.py:170-176, metrics.py:25).

Usage: python scripts/make_synthetic_data.py [root=data]
"""

import json
import os
import pickle
import sys

import numpy as np
import pandas as pd


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "data"
    vids = os.path.join(root, "MSRVTT/videos/all")
    labels = os.path.join(root, "labels")
    ann_dir = os.path.join(root, "MSRVTT/annotation")
    for d in (vids, labels, ann_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    rows, encoded = [], {}
    cap_id = 0
    words = [2023, 2158, 2003, 2652, 2365, 2007, 1037, 1899]
    for i in range(20):
        vid = f"video{i}"
        np.save(os.path.join(vids, vid + ".npy"),
                rng.integers(0, 255, size=(18, 120, 160, 3), dtype=np.uint8))
        split = "train" if i < 12 else ("validate" if i < 16 else "test")
        for _ in range(2):
            rows.append({"image_id": vid, "id": cap_id,
                         "caption": "a man is playing with a dog",
                         "split": split})
            encoded[cap_id] = [101] + list(rng.choice(words, size=5))
            cap_id += 1

    pd.DataFrame(rows).to_csv(os.path.join(labels, "labels.csv"), index=False)
    with open(os.path.join(labels, "encoded_captions.pkl"), "wb") as f:
        pickle.dump(encoded, f)
    ann = {"annotations": [{"image_id": r["image_id"],
                            "caption": r["caption"], "id": r["id"]}
                           for r in rows],
           "images": [{"id": f"video{i}"} for i in range(20)]}
    with open(os.path.join(ann_dir, "MSR_VTT.json"), "w") as f:
        json.dump(ann, f)
    print(f"synthetic MSRVTT tree at {root}: {len(rows)} captions, 20 clips")


if __name__ == "__main__":
    main()
