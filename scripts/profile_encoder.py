"""Stage-by-stage TinyViT latency breakdown on the current backend.

Usage: python scripts/profile_encoder.py [batch_frames] [reps]
Times the full encoder and each stage module alone at representative
shapes, using the §4 scan-delta method (docs/PERF.md): N iterations
inside one jitted ``lax.scan`` whose carry folds a full-output reduction
back into the input, timed at two scan lengths so the dispatch + fetch
RTT cancels. The previous per-rep-fetch version read the ~27 ms tunnel
RTT floor for every sub-ms part ("~25 ms everywhere" at 6 frames).
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
    from rtvc_tpu.models.tinyvit import (MBConv, PatchEmbed, PatchMerging,
                                         TinyViT, TinyViTBlock,
                                         tiny_vit_21m_config)

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = tiny_vit_21m_config(dtype=jnp.bfloat16)
    model = TinyViT(cfg)
    x = jnp.zeros((n_frames, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    jax.block_until_ready(variables)

    def scan_time(apply, v, xx):
        """(t(scan_{1+reps}) - t(scan_1)) / reps, carry-perturbed input."""
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
            np.asarray(f(v, xx))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(v, xx))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    print(f"frames={n_frames} dtype={cfg.dtype} reps={reps}", flush=True)
    ms_full = scan_time(lambda v, x_: model.apply(v, x_)[-1], variables, x)
    print(f"full encode: {ms_full:.3f} ms", flush=True)

    stage_shapes = [(n_frames, 56, 56, cfg.embed_dims[0])]
    for s in range(1, 4):
        stage_shapes.append((n_frames, 56 // 2 ** s, 56 // 2 ** s,
                             cfg.embed_dims[s]))

    acc = 0.0
    pe = PatchEmbed(cfg.embed_dims[0], dtype=cfg.dtype)
    pe_vars = jax.jit(pe.init)(jax.random.PRNGKey(0), x)
    t = scan_time(pe.apply, pe_vars, x)
    acc += t
    print(f"patch_embed: {t:.3f} ms", flush=True)

    mb = MBConv(cfg.embed_dims[0], cfg.mbconv_expand_ratio, 0.0, cfg.dtype)
    h0 = jnp.zeros(stage_shapes[0], cfg.dtype)
    mb_vars = jax.jit(mb.init)(jax.random.PRNGKey(0), h0)
    t = scan_time(mb.apply, mb_vars, h0)
    acc += t * cfg.depths[0]
    print(f"stage0 MBConv: {t:.3f} ms x{cfg.depths[0]} = "
          f"{t * cfg.depths[0]:.3f} ms", flush=True)

    for s in range(1, 4):
        hin = jnp.zeros(stage_shapes[s - 1], cfg.dtype)
        ds = PatchMerging(cfg.embed_dims[s], dtype=cfg.dtype)
        ds_vars = jax.jit(ds.init)(jax.random.PRNGKey(0), hin)
        t_ds = scan_time(ds.apply, ds_vars, hin)
        hs = jnp.zeros(stage_shapes[s], cfg.dtype)
        blk = TinyViTBlock(cfg.embed_dims[s], cfg.num_heads[s],
                           cfg.window_sizes[s], cfg.mlp_ratio, 0.0, 0.0,
                           cfg.dtype)
        blk_vars = jax.jit(blk.init)(jax.random.PRNGKey(0), hs)
        t_blk = scan_time(blk.apply, blk_vars, hs)
        acc += t_ds + t_blk * cfg.depths[s]
        print(f"stage{s}: downsample {t_ds:.3f} ms, "
              f"block {t_blk:.3f} ms x{cfg.depths[s]} = "
              f"{t_blk * cfg.depths[s]:.3f} ms", flush=True)

    print(f"\nparts sum {acc:.3f} ms vs full {ms_full:.3f} ms "
          f"(parts compiled alone lose cross-stage fusion)", flush=True)


if __name__ == "__main__":
    main()
