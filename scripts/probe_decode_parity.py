"""Probe: teacher-forced logits vs KV-cache decode-step logits, per step.

Diagnostic for the memorization run's SEP anomaly (docs/LEARNING.md): the
trained checkpoint's teacher-forced argmax at the SEP position is SEP for
12/12 clips, yet greedy decode emits [UNK] there. Both programs are
supposed to compute the same function on the same prefix (the cache path
is pinned vs the forced path by tests at random init); this probe runs
them side by side ON THE TRAINED WEIGHTS, feeding the cache path the
GROUND-TRUTH token at every step, and reports per-step max |logit delta|
and both argmaxes — separating "cache-path numeric/semantic divergence"
from "thin-margin argmax flip".

Usage: python scripts/probe_decode_parity.py [--root results/memorize_flagship]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="results/memorize_flagship")
    p.add_argument("--rows", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.config import cfg
    from rtvc_tpu.data.dataset import CaptionDataset, DeviceLoader, \
        load_labels
    from rtvc_tpu.data.io import restore_checkpoint
    from rtvc_tpu.models.student import student_from_config

    variables = restore_checkpoint(
        os.path.join(os.path.abspath(args.root), "ckpt_final"))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    student = student_from_config(cfg)

    data, encoded = load_labels(
        os.path.join(args.root, "labels.csv"),
        os.path.join(args.root, "encoded_captions.pkl"))
    ids = data.loc[data["split"] == "train", "image_id"].unique()
    ds = CaptionDataset(os.path.join(args.root, "videos"), list(ids), data,
                        encoded, num_frames=cfg.data.num_frames,
                        random_state=cfg.seed)
    loader = DeviceLoader(ds, args.rows, shuffle=False, seed=0)
    batch = next(iter(loader))
    frames = batch["frames"]
    y = np.asarray(batch["caption"])
    b, t_len = y.shape

    forced = jax.jit(lambda v, f, yy: student.apply(v, f, yy,
                                                    train=False)[-1])
    f_logits = np.asarray(forced(variables, frames, jnp.asarray(y)))

    # cache path, teacher-forced: feed the GT token at every step
    def encode(mdl, x):
        _, memory = mdl.forward_image_enc(x)
        return memory

    memory = jax.jit(lambda v, f: student.apply(v, f, method=encode))(
        variables, frames)
    total = t_len
    caches = student.apply(
        variables, b, total, memory,
        method=lambda mdl, b_, t_, m_: mdl.init_cache(b_, t_, m_))

    step = jax.jit(lambda v, tok, i, c, m: student.apply(
        v, tok, i, c, m,
        method=lambda mdl, t_, i_, c_, m_: mdl.decode_step(t_, i_, c_, m_)))

    tokens = jnp.asarray(y)  # GT-forced
    n_steps = min(total - 1, 14)
    print(f"{'step':>4s} {'max|dlogit|':>12s}  forced-top2 vs cache-top2 "
          f"(row 0)")
    for i in range(n_steps):
        pos = jnp.arange(total)[None, :]
        kv_mask = (pos <= i) & (tokens != 0)
        c_log, caches = step(variables, tokens[:, i], jnp.int32(i), caches,
                             kv_mask)
        c_log = np.asarray(c_log)
        d = float(np.max(np.abs(c_log - f_logits[:, i])))
        ftop = np.argsort(f_logits[0, i])[-2:][::-1]
        ctop = np.argsort(c_log[0])[-2:][::-1]
        fp = np.exp(f_logits[0, i] - f_logits[0, i].max())
        fp /= fp.sum()
        cp = np.exp(c_log[0] - c_log[0].max())
        cp /= cp.sum()
        flag = "" if int(ftop[0]) == int(ctop[0]) else "  <-- ARGMAX FLIP"
        print("%4d %12.5f  f:%6d(%.3f)/%6d(%.3f)  c:%6d(%.3f)/%6d(%.3f)%s"
              % (i, d, int(ftop[0]), float(fp[ftop[0]]),
                 int(ftop[1]), float(fp[ftop[1]]),
                 int(ctop[0]), float(cp[ctop[0]]),
                 int(ctop[1]), float(cp[ctop[1]]), flag), flush=True)


if __name__ == "__main__":
    main()
