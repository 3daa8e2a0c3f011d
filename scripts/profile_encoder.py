"""Stage-by-stage TinyViT latency breakdown on the current backend.

Usage: python scripts/profile_encoder.py [batch_frames]
Times jitted prefixes of the encoder (patch embed, +stage0, +stage1, ...)
to locate where the 6-frame encode budget goes.
"""

import os
import sys
import time

import numpy as np

# repo root on sys.path (do NOT use PYTHONPATH: any value of it breaks the
# sandbox's axon TPU plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401  (compile cache, offline env)
    from rtvc_tpu.models.tinyvit import (ConvBN, MBConv, PatchEmbed,
                                         PatchMerging, TinyViT, TinyViTBlock,
                                         tiny_vit_21m_config)

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    cfg = tiny_vit_21m_config(dtype=jnp.bfloat16)
    model = TinyViT(cfg)
    x = jnp.zeros((n_frames, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(variables)

    # full forward
    full = jax.jit(lambda v, x: model.apply(v, x)[-1])
    np.asarray(full(variables, x))

    def bench(fn, *args, reps=20):
        np.asarray(jnp.sum(fn(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(*args)))
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50) * 1e3)

    print(f"frames={n_frames} dtype={cfg.dtype}")
    print(f"full encode p50: {bench(full, variables, x):.2f} ms")

    # prefix timings: run __call__ but stop after stage s (monkey via apply
    # of a sliced module is invasive; instead time each stage module alone
    # with representative shapes)
    stage_shapes = [(n_frames, 56, 56, cfg.embed_dims[0])]
    for s in range(1, 4):
        stage_shapes.append((n_frames, 56 // 2 ** s, 56 // 2 ** s,
                             cfg.embed_dims[s]))

    pe = PatchEmbed(cfg.embed_dims[0], dtype=cfg.dtype)
    pe_vars = jax.jit(pe.init)(jax.random.PRNGKey(0), x)
    print(f"patch_embed p50: {bench(jax.jit(pe.apply), pe_vars, x):.2f} ms")

    mb = MBConv(cfg.embed_dims[0], cfg.mbconv_expand_ratio, 0.0, cfg.dtype)
    h0 = jnp.zeros(stage_shapes[0], cfg.dtype)
    mb_vars = jax.jit(mb.init)(jax.random.PRNGKey(0), h0)
    t = bench(jax.jit(mb.apply), mb_vars, h0)
    print(f"stage0 MBConv x{cfg.depths[0]} p50: {t * cfg.depths[0]:.2f} ms")

    for s in range(1, 4):
        hin = jnp.zeros(stage_shapes[s - 1], cfg.dtype)
        ds = PatchMerging(cfg.embed_dims[s], dtype=cfg.dtype)
        ds_vars = jax.jit(ds.init)(jax.random.PRNGKey(0), hin)
        t_ds = bench(jax.jit(ds.apply), ds_vars, hin)
        hs = jnp.zeros(stage_shapes[s], cfg.dtype)
        blk = TinyViTBlock(cfg.embed_dims[s], cfg.num_heads[s],
                           cfg.window_sizes[s], cfg.mlp_ratio, 0.0, 0.0,
                           cfg.dtype)
        blk_vars = jax.jit(blk.init)(jax.random.PRNGKey(0), hs)
        t_blk = bench(jax.jit(blk.apply), blk_vars, hs)
        print(f"stage{s}: downsample {t_ds:.2f} ms, "
              f"block {t_blk:.2f} ms x{cfg.depths[s]} = "
              f"{t_blk * cfg.depths[s]:.2f} ms")


if __name__ == "__main__":
    main()
