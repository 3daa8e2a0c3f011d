"""Per-stage roofline for the TinyViT-21M student encoder (VERDICT r2 #2).

For every stage of the encoder at the training shape (48 frames = batch 8
clips x 6 frames, 224px, bf16): analytic FLOPs, a fused-lower-bound HBM
byte count (each conv/dense reads its input + weights and writes its
output once; BN/GELU/residual assumed fused), measured scan-isolated
device time, and the achieved fraction of the v5e MXU (197 TFLOP/s bf16)
and HBM (819 GB/s) peaks. The binding resource per stage tells us whether
the ~9% whole-encoder MFU is a hardware ceiling or a software gap.

Usage: python scripts/roofline_student.py [reps] [--train]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def conv_cost(h, w, cin, cout, k=1, groups=1, stride=1, dtype_bytes=2):
    """(flops, bytes) for ConvBN(+GELU): conv MACs x2; read in, write out,
    read weights; BN/GELU fused (no extra HBM traffic)."""
    ho, wo = h // stride, w // stride
    flops = 2 * ho * wo * cout * (cin // groups) * k * k
    bytes_ = (h * w * cin + ho * wo * cout) * dtype_bytes \
        + k * k * (cin // groups) * cout * dtype_bytes
    return flops, bytes_


def dense_cost(m, kdim, n, dtype_bytes=2):
    flops = 2 * m * kdim * n
    bytes_ = (m * kdim + m * n + kdim * n) * dtype_bytes
    return flops, bytes_


def analytic_costs(b=48):
    """Per-component (flops, fused-lower-bound bytes) at tiny_vit_21m/224."""
    C = {}

    def add(name, items):
        f = sum(i[0] for i in items)
        by = sum(i[1] for i in items)
        C[name] = (f * b, by * b)

    # patch_embed: 3->48 3x3 s2 @224, 48->96 3x3 s2 @112
    add("patch_embed", [conv_cost(224, 224, 3, 48, 3, stride=2),
                        conv_cost(112, 112, 48, 96, 3, stride=2)])
    # stage0: 2 x MBConv(96, expand 4) @56
    mb = [conv_cost(56, 56, 96, 384, 1),
          conv_cost(56, 56, 384, 384, 3, groups=384),
          conv_cost(56, 56, 384, 96, 1),
          (0, 2 * 56 * 56 * 96 * 2)]  # residual read+write
    add("stage0 (2xMBConv)", mb * 2)
    # downsample1: 96->192: 1x1 @56, dw 3x3 s2, 1x1 @28
    add("downsample1", [conv_cost(56, 56, 96, 192, 1),
                        conv_cost(56, 56, 192, 192, 3, groups=192, stride=2),
                        conv_cost(28, 28, 192, 192, 1)])

    def tvblock(hw, c, heads, win):
        n_win = (hw // win) ** 2 if hw % win == 0 else -(-hw // win) ** 2
        ntok = win * win
        kd = c // heads
        items = [dense_cost(hw * hw, c, 3 * c),                 # qkv
                 # scores + att@v per window (f32 scores -> 4B intermediate,
                 # but fused flash-style by XLA; count in+out only)
                 (2 * n_win * heads * ntok * ntok * kd * 2,
                  n_win * heads * ntok * ntok * 4 * 0),          # stays VMEM
                 dense_cost(hw * hw, c, c),                      # proj
                 conv_cost(hw, hw, c, c, 3, groups=c),           # local_conv
                 dense_cost(hw * hw, c, 4 * c),                  # mlp up
                 dense_cost(hw * hw, 4 * c, c),                  # mlp down
                 (0, 4 * hw * hw * c * 2)]                       # 2 residuals
        return items

    add("stage1 (2 blk @28,192)", tvblock(28, 192, 6, 7) * 2)
    add("downsample2", [conv_cost(28, 28, 192, 384, 1),
                        conv_cost(28, 28, 384, 384, 3, groups=384, stride=2),
                        conv_cost(14, 14, 384, 384, 1)])
    add("stage2 (6 blk @14,384)", tvblock(14, 384, 12, 14) * 6)
    add("downsample3", [conv_cost(14, 14, 384, 576, 1),
                        conv_cost(14, 14, 576, 576, 3, groups=576, stride=2),
                        conv_cost(7, 7, 576, 576, 1)])
    add("stage3 (2 blk @7,576)", tvblock(7, 576, 18, 7) * 2)
    return C


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.models import tinyvit as tv

    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 8
    train = "--train" in sys.argv
    print(f"backend={jax.default_backend()} reps={reps} train={train}")
    b = 48
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def scan_time(apply, variables, x):
        """Scan-isolated device time; variables pass as jit args (memory
        note: closures inline 100s-of-MB constants over the tunnel)."""
        def run(n):
            def scanned(v, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = apply(v, first)
                    # sum EVERY output leaf: folding only the first feature
                    # map into the carry let XLA DCE stages 1-3 of the whole-
                    # model run (observed "3.75 ms whole encoder" vs a 24.6 ms
                    # stage sum); closing over xx instead of passing it as an
                    # arg would inline it as an MLIR constant (PERF.md §4)
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

    cfg = tv.tiny_vit_21m_config(dtype=dtype, drop_path_rate=0.0)

    def block_apply(mod):
        if train:
            return lambda v, xx: mod.apply(
                v, xx, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})[0]
        return lambda v, xx: mod.apply(v, xx, False)

    stages = []
    # (name, module, input shape)
    stages.append(("patch_embed",
                   tv.PatchEmbed(96, dtype=dtype), (b, 224, 224, 3)))

    class _Seq(tv.nn.Module):
        mods: tuple

        @tv.nn.compact
        def __call__(self, x, train=False):
            for i, (cls, kw) in enumerate(self.mods):
                x = cls(**kw, name=f"m{i}")(x, train)
            return x

    stages.append(("stage0 (2xMBConv)", _Seq(tuple(
        (tv.MBConv, dict(dim=96, expand_ratio=4.0, drop_path=0.0,
                         dtype=dtype)) for _ in range(2))), (b, 56, 56, 96)))
    stages.append(("downsample1", tv.PatchMerging(192, dtype=dtype),
                   (b, 56, 56, 96)))
    stages.append(("stage1 (2 blk @28,192)", _Seq(tuple(
        (tv.TinyViTBlock, dict(dim=192, num_heads=6, window=7, mlp_ratio=4.0,
                               drop_path=0.0, dropout=0.0, dtype=dtype))
        for _ in range(2))), (b, 28, 28, 192)))
    stages.append(("downsample2", tv.PatchMerging(384, dtype=dtype),
                   (b, 28, 28, 192)))
    stages.append(("stage2 (6 blk @14,384)", _Seq(tuple(
        (tv.TinyViTBlock, dict(dim=384, num_heads=12, window=14,
                               mlp_ratio=4.0, drop_path=0.0, dropout=0.0,
                               dtype=dtype)) for _ in range(6))),
        (b, 14, 14, 384)))
    stages.append(("downsample3", tv.PatchMerging(576, dtype=dtype),
                   (b, 14, 14, 384)))
    stages.append(("stage3 (2 blk @7,576)", _Seq(tuple(
        (tv.TinyViTBlock, dict(dim=576, num_heads=18, window=7, mlp_ratio=4.0,
                               drop_path=0.0, dropout=0.0, dtype=dtype))
        for _ in range(2))), (b, 7, 7, 576)))

    costs = analytic_costs(b)
    total_ms = 0.0
    print(f"{'stage':28s} {'ms':>7s} {'GFLOP':>8s} {'MB':>8s} "
          f"{'TFLOP/s':>8s} {'%MXU':>6s} {'GB/s':>7s} {'%HBM':>6s} bound")
    for name, mod, shape in stages:
        x = jnp.asarray(rng.normal(size=shape), dtype)
        variables = jax.jit(mod.init)(key, x)
        ms = scan_time(block_apply(mod), variables, x)
        total_ms += ms
        f, by = costs[name]
        tf = f / ms / 1e9
        gbs = by / ms / 1e6
        fl_frac = tf / V5E_BF16_TFLOPS
        bw_frac = gbs / V5E_HBM_GBS
        bound = "MXU" if fl_frac > bw_frac else "HBM"
        print(f"{name:28s} {ms:7.2f} {f / 1e9:8.1f} {by / 1e6:8.1f} "
              f"{tf:8.1f} {100 * fl_frac:5.1f}% {gbs:7.1f} "
              f"{100 * bw_frac:5.1f}% {bound}")

    # whole-encoder cross-check
    model = tv.TinyViT(cfg)
    x = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), dtype)
    variables = jax.jit(model.init)(key, x)
    if train:
        apply = lambda v, xx: model.apply(  # noqa: E731
            v, xx, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})[0]
    else:
        apply = lambda v, xx: model.apply(v, xx, False)  # noqa: E731
    ms = scan_time(apply, variables, x)
    ftot = sum(f for f, _ in costs.values())
    btot = sum(by for _, by in costs.values())
    print(f"{'sum of stages':28s} {total_ms:7.2f}")
    print(f"{'whole TinyViT fwd':28s} {ms:7.2f} {ftot / 1e9:8.1f} "
          f"{btot / 1e6:8.1f} {ftot / ms / 1e9:8.1f} "
          f"{100 * ftot / ms / 1e9 / V5E_BF16_TFLOPS:5.1f}% "
          f"{btot / ms / 1e6:7.1f} "
          f"{100 * btot / ms / 1e6 / V5E_HBM_GBS:5.1f}%")


if __name__ == "__main__":
    main()
