"""Sub-op dissection of the TinyViT encoder stages (round-3 roofline
follow-up): which primitive eats each stage's milliseconds, and the A/Bs
VERDICT r2 asked for — BN cost (ConvBN vs bare conv ≈ is folding worth
anything under XLA fusion?), depthwise-conv lowering (lax conv vs a 9-tap
shifted-add formulation), and window attention vs the rest of a block.

All scan-isolated at the training shape (48 frames), bf16.

Usage: python scripts/profile_tinyvit_ops.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.models import tinyvit as tv

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    def scan_time(apply, variables, x):
        def run(n):
            def scanned(v, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = apply(v, first)
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(o))[None]
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

    def bench_module(name, mod, shape, apply=None):
        x = jnp.asarray(rng.normal(size=shape), dtype)
        variables = jax.jit(mod.init)(key, x)
        ms = scan_time(apply or (lambda v, xx: mod.apply(v, xx)), variables, x)
        print(f"{name:44s} {ms:8.3f} ms", flush=True)
        return ms

    b = 48

    # ---- stage0 anatomy: 1x1 convs, depthwise, BN, GELU ------------------
    class Conv1x1(nn.Module):
        cout: int

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.cout, (1, 1), use_bias=False, dtype=dtype,
                           name="c")(x)

    class ConvDW(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            return nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                           feature_group_count=c, use_bias=False,
                           dtype=dtype, name="c")(x)

    class ConvDW9Tap(nn.Module):
        """Depthwise 3x3 as 9 shifted multiply-adds (pure VPU, no conv op)."""

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            w = self.param("w", nn.initializers.normal(), (3, 3, c), dtype)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h, wd = x.shape[1], x.shape[2]
            out = jnp.zeros_like(x)
            for dy in range(3):
                for dx in range(3):
                    out = out + xp[:, dy:dy + h, dx:dx + wd, :] * w[dy, dx]
            return out

    class BareMBConv(nn.Module):
        """MBConv with BN removed entirely (bound on what folding buys)."""

        @nn.compact
        def __call__(self, x):
            shortcut = x
            h = Conv1x1(384, name="c1")(x)
            h = nn.gelu(h, approximate=False)
            h = ConvDW(name="c2")(h)
            h = nn.gelu(h, approximate=False)
            h = Conv1x1(96, name="c3")(h)
            return nn.gelu(shortcut + h, approximate=False)

    print("--- stage0 anatomy (shapes @48x56x56) ---")
    bench_module("conv1x1 96->384 @56", Conv1x1(384), (b, 56, 56, 96))
    bench_module("conv1x1 384->96 @56", Conv1x1(96), (b, 56, 56, 384))
    dw = bench_module("depthwise 3x3 @56x384 (lax conv)", ConvDW(),
                      (b, 56, 56, 384))
    dw9 = bench_module("depthwise 3x3 @56x384 (9-tap adds)", ConvDW9Tap(),
                       (b, 56, 56, 384))
    mb_eval = bench_module(
        "MBConv96 eval (ConvBN)",
        tv.MBConv(96, 4.0, 0.0, dtype=dtype), (b, 56, 56, 96),
        apply=lambda v, xx: tv.MBConv(96, 4.0, 0.0, dtype=dtype).apply(
            v, xx, False))
    mb_bare = bench_module("MBConv96 eval (BN stripped)", BareMBConv(),
                           (b, 56, 56, 96))
    print(f"  -> BN-eval cost per MBConv: {mb_eval - mb_bare:.3f} ms "
          f"(folding bound); dw 9-tap vs conv: {dw9:.3f} vs {dw:.3f}")

    # ---- stage1/2 block anatomy ------------------------------------------
    print("--- TinyViT block anatomy ---")
    for hw, c, heads, win, nb in ((28, 192, 6, 7, 16), (14, 384, 12, 14, 1)):
        ntok = win * win
        nwin = b * nb
        bench_module(f"window-attn @{hw} ({nwin}x{ntok}x{c})",
                     tv.WindowAttention(c, heads, win, dtype=dtype),
                     (nwin, ntok, c))
        bench_module(f"mlp {c}->{4 * c} @{hw}",
                     tv.nn.Sequential([
                         nn.LayerNorm(epsilon=1e-5, dtype=dtype),
                         nn.Dense(4 * c, dtype=dtype),
                         nn.Dense(c, dtype=dtype)]),
                     (b, hw * hw, c))
        bench_module(f"local dw conv @{hw}x{c}", ConvDW(), (b, hw, hw, c))
        blk = tv.TinyViTBlock(c, heads, win, 4.0, 0.0, 0.0, dtype=dtype)
        bench_module(f"full block @{hw}x{c}", blk, (b, hw, hw, c),
                     apply=lambda v, xx, m=blk: m.apply(v, xx, False))

    # ---- patch embed without BN ------------------------------------------
    class BareStem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(48, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dtype, name="c1")(x)
            x = nn.gelu(x, approximate=False)
            return nn.Conv(96, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           dtype=dtype, name="c2")(x)

    print("--- stem ---")
    bench_module("patch_embed eval (ConvBN)",
                 tv.PatchEmbed(96, dtype=dtype), (b, 224, 224, 3),
                 apply=lambda v, xx: tv.PatchEmbed(96, dtype=dtype).apply(
                     v, xx, False))
    bench_module("patch_embed (BN stripped)", BareStem(), (b, 224, 224, 3))


if __name__ == "__main__":
    main()
