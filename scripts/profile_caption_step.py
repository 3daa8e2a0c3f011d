"""Scan-isolated (device-time) dissection of the batch-8 caption step —
the program behind bench.py's batch-8 clips/s and BatchCaptionServer's
bucket programs: fused preprocess, TinyViT encode + memory projection,
and the greedy KV-cache decode loop (cost per generated token via the
slope over max_len), plus the beam-K variant serving's ``beam=`` uses.

Methodology: docs/PERF.md §4 (sub-10 ms parts need the one-jitted-scan
method on the axon tunnel; per-rep fetches have a ~30 ms RTT floor).

Usage: python scripts/profile_caption_step.py [reps] [batch]
(batch=1 dissects the device-anchored bench headline program.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401  (compile cache, offline env)
    from rtvc_tpu import decode as decode_lib
    from rtvc_tpu.config import cfg
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.ops.preprocess import clip_preprocess

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    window, max_len = 6, 25  # bench.py / serving defaults

    model = student_from_config(cfg)
    frames0 = jnp.zeros((1, window, 224, 224, 3), jnp.float32)
    y0 = jnp.array([[model.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), frames0, y0)
    jax.block_until_ready(variables)
    print(f"backend={jax.default_backend()} reps={reps} batch={batch} "
          f"window={window} max_len={max_len}", flush=True)

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, size=(batch, window, 224, 224, 3)),
                     jnp.uint8)
    proc = jnp.asarray(rng.normal(scale=0.5,
                                  size=(batch, window, 224, 224, 3)),
                       jnp.float32)

    def scan_time(apply, x):
        def run(n):
            def scanned(v, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = apply(v, first)
                    s = sum(jnp.sum(leaf.astype(jnp.float32))
                            for leaf in jax.tree.leaves(o))[None]
                    return s * 1e-12, ()
                return jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(variables, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(variables, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    def row(name, ms, note=""):
        print(f"{name:44s} {ms:8.3f} ms  {note}", flush=True)

    # 1. fused preprocess (uint8 window batch -> CLIP-normalized f32)
    def pre(v, x):
        flat = x.reshape((batch * window,) + x.shape[2:])
        return clip_preprocess(flat)
    ms_pre = scan_time(pre, u8)
    row("clip_preprocess (48 frames u8->f32)", ms_pre)

    # 2. encoder + memory projection (the decode loop's prefix work)
    def enc(v, x):
        def m(mdl, x_):
            return mdl.forward_image_enc(x_)[1]
        return model.apply(v, x, method=m)
    ms_enc = scan_time(enc, proc)
    row("forward_image_enc (TinyViT + memory)", ms_enc)

    # 3. greedy decode at several horizons -> per-token slope.
    # Random weights never hit the all-rows-SEP early stop, so the
    # while_loop runs its full max_len iterations here.
    def greedy_at(n):
        def g(v, x):
            return decode_lib.student_greedy(model, v, x, max_len=n)
        return g
    horizons = (5, 15, max_len)
    ms_g = {n: scan_time(greedy_at(n), proc) for n in horizons}
    for n in horizons:
        row(f"student_greedy max_len={n}", ms_g[n])
    per_tok = (ms_g[max_len] - ms_g[horizons[0]]) / (max_len - horizons[0])
    intercept = ms_g[horizons[0]] - per_tok * horizons[0]
    row("  -> decode loop per token (slope)", per_tok,
        f"(intercept {intercept:.2f} ms ~= encode+cache-init)")

    # 4. the full serving/bench caption step (preprocess + greedy)
    def full(v, x):
        flat = x.reshape((batch * window,) + x.shape[2:])
        p = clip_preprocess(flat).reshape((batch, window) + x.shape[2:])
        return decode_lib.student_greedy(model, v, p, max_len=max_len)
    ms_full = scan_time(full, u8)
    row("FULL caption step (pre + greedy 25)", ms_full,
        f"= {batch / ms_full * 1e3:.1f} clips/s/chip device-side")

    # 5. the beam-K step serving's beam= compiles
    def beam(v, x):
        flat = x.reshape((batch * window,) + x.shape[2:])
        p = clip_preprocess(flat).reshape((batch, window) + x.shape[2:])
        return decode_lib.student_beam(model, v, p, max_len=max_len, k=3)
    ms_beam = scan_time(beam, u8)
    row("FULL beam-3 step (pre + beam 25)", ms_beam,
        f"({ms_beam / ms_full:.2f}x greedy)")

    acc = ms_pre + ms_enc + per_tok * max_len
    print(f"\nparts sum (pre + enc + {max_len} tok): {acc:.2f} ms "
          f"vs full {ms_full:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
