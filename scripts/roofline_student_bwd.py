"""Backward-pass roofline for the student (VERDICT r3 #3 / PERF.md §1d).

The replay-step dissection (scripts/profile_replay_step.py) showed
fwd ≈ 9.2 ms vs fwd+bwd ≈ 33.7 ms — the backward is 2.6× the forward and
50%+ of the steady-state training step, and round 3 waved it through as
"the expected shape". This script gives the bwd the same treatment the
§1b roofline gave the fwd:

1. per-stage fwd / fwd+bwd / dgrad-only scan-isolated device times at the
   training shape (48 frames, bf16, eval-mode BN so per-stage grads are
   well-defined); wgrad ≈ (fwd+bwd) − (fwd + dgrad-only-minus-fwd)
   (attribution, not an exact split — XLA shares subexpressions);
2. lever-VJP survival: erf vs tanh GELU through the MBConv stage's
   backward, f32 vs bf16 softmax through a window block's backward — did
   the §1b forward levers silently regenerate f32/erf in their VJPs?
3. remat A/B: the full replay-step fwd+bwd with cfg.tpu.remat_encoder
   on/off (trade encoder activation memory for recompute).

Usage: python scripts/roofline_student_bwd.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.models import tinyvit as tv

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    b = 48
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def scan_time(fn, variables, x):
        """fn(v, xx) -> pytree; scan-isolated device ms (PERF.md §4)."""
        def run(n):
            def scanned(v, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = fn(v, first)
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

    class _Seq(tv.nn.Module):
        mods: tuple

        @tv.nn.compact
        def __call__(self, x, train=False):
            for i, (cls, kw) in enumerate(self.mods):
                x = cls(**kw, name=f"m{i}")(x, train)
            return x

    def tvblocks(n, dim, heads, win):
        return _Seq(tuple(
            (tv.TinyViTBlock, dict(dim=dim, num_heads=heads, window=win,
                                   mlp_ratio=4.0, drop_path=0.0, dropout=0.0,
                                   dtype=dtype, gelu_approx=True))
            for _ in range(n)))

    stages = [
        ("patch_embed", tv.PatchEmbed(96, dtype=dtype, gelu_approx=True),
         (b, 224, 224, 3)),
        ("stage0 (2xMBConv)", _Seq(tuple(
            (tv.MBConv, dict(dim=96, expand_ratio=4.0, drop_path=0.0,
                             dtype=dtype, gelu_approx=True))
            for _ in range(2))), (b, 56, 56, 96)),
        ("downsample1", tv.PatchMerging(192, dtype=dtype), (b, 56, 56, 96)),
        ("stage1 (2 blk @28,192)", tvblocks(2, 192, 6, 7), (b, 28, 28, 192)),
        ("downsample2", tv.PatchMerging(384, dtype=dtype), (b, 28, 28, 192)),
        ("stage2 (6 blk @14,384)", tvblocks(6, 384, 12, 14),
         (b, 14, 14, 384)),
        ("downsample3", tv.PatchMerging(576, dtype=dtype), (b, 14, 14, 384)),
        ("stage3 (2 blk @7,576)", tvblocks(2, 576, 18, 7), (b, 7, 7, 576)),
    ]

    print(f"{'stage':26s} {'fwd':>7s} {'f+b':>7s} {'bwd':>7s} "
          f"{'dgrad':>7s} {'wgrad~':>7s} {'bwd/fwd':>8s}")
    tot = np.zeros(3)
    for name, mod, shape in stages:
        x = jnp.asarray(rng.normal(size=shape), dtype)
        variables = jax.jit(mod.init)(key, x)

        def fwd(v, xx):
            return mod.apply(v, xx, False)

        def loss(v, xx):
            return jnp.sum(mod.apply(v, xx, False).astype(jnp.float32) ** 2)

        def fwdbwd(v, xx):
            return jax.grad(loss, argnums=(0, 1))(v, xx)

        def dgrad_only(v, xx):
            return jax.grad(loss, argnums=1)(v, xx)

        ms_f = scan_time(fwd, variables, x)
        ms_fb = scan_time(fwdbwd, variables, x)
        ms_dg = scan_time(dgrad_only, variables, x)
        bwd = ms_fb - ms_f
        dg = ms_dg - ms_f
        wg = ms_fb - ms_dg
        tot += (ms_f, ms_fb, bwd)
        print(f"{name:26s} {ms_f:7.3f} {ms_fb:7.3f} {bwd:7.3f} "
              f"{dg:7.3f} {wg:7.3f} {bwd / max(ms_f, 1e-9):7.2f}x",
              flush=True)
    print(f"{'TOTAL':26s} {tot[0]:7.3f} {tot[1]:7.3f} {tot[2]:7.3f}")

    # ---- lever-VJP survival -------------------------------------------------
    print("\nlever-VJP survival (fwd+bwd, scan-isolated):", flush=True)
    x0 = jnp.asarray(rng.normal(size=(b, 56, 56, 96)), dtype)
    for label, approx in (("erf GELU", False), ("tanh GELU", True)):
        mod = _Seq(tuple(
            (tv.MBConv, dict(dim=96, expand_ratio=4.0, drop_path=0.0,
                             dtype=dtype, gelu_approx=approx))
            for _ in range(2)))
        variables = jax.jit(mod.init)(key, x0)

        def fwdbwd(v, xx, mod=mod):
            def loss(v_, x_):
                return jnp.sum(mod.apply(v_, x_, False)
                               .astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(v, xx)

        ms = scan_time(fwdbwd, variables, x0)
        print(f"  2xMBConv96 {label:10s} {ms:7.3f} ms", flush=True)

    x1 = jnp.asarray(rng.normal(size=(b, 14, 14, 384)), dtype)
    real_mha = tv.multi_head_attention
    for label, native in (("f32 softmax ", False), ("bf16 softmax", True)):
        def patched(q, k, v, **kw):
            kw["softmax_in_input_dtype"] = native
            return real_mha(q, k, v, **kw)
        tv.multi_head_attention = patched
        mod = tvblocks(6, 384, 12, 14)
        variables = jax.jit(mod.init)(key, x1)

        def fwdbwd(v, xx, mod=mod):
            def loss(v_, x_):
                return jnp.sum(mod.apply(v_, x_, False)
                               .astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))(v, xx)

        ms = scan_time(fwdbwd, variables, x1)
        print(f"  stage2 x6  {label:12s} {ms:7.3f} ms", flush=True)
        tv.multi_head_attention = real_mha

    # ---- remat A/B on the full replay-step fwd+bwd -------------------------
    print("\nremat A/B (full distill fwd+bwd, replay targets, batch 8):",
          flush=True)
    import optax

    from rtvc_tpu.config import cfg as app_cfg
    from rtvc_tpu.data.teacher_cache import densify_topk
    from rtvc_tpu.distill import LossWeights, distillation_losses
    from rtvc_tpu.train import create_train_state

    batch, t_len, top_k, vocab = 8, 40, 128, 30522
    frames = jnp.asarray(rng.normal(size=(batch, 6, 224, 224, 3))
                         .astype(np.float32))
    caps_np = rng.integers(1, 30000, size=(batch, t_len)).astype(np.int32)
    caps_np[:, 0] = 101
    caps = jnp.asarray(caps_np)
    vals = jnp.asarray(rng.normal(size=(batch, t_len, top_k))
                       .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, vocab, size=(batch, t_len, top_k))
                      .astype(np.int32))
    weights = LossWeights()
    drng = jax.random.PRNGKey(2)
    tx = optax.adam(1e-4)

    import dataclasses

    from rtvc_tpu.models.student import student_from_config

    for label, remat in (("remat off (shipping)", False), ("remat on", True)):
        cfg_r = dataclasses.replace(
            app_cfg, tpu=dataclasses.replace(app_cfg.tpu,
                                             remat_encoder=remat))
        student = student_from_config(cfg_r)
        state = create_train_state(student, jax.random.PRNGKey(1),
                                   {"frames": frames, "caption": caps}, tx)
        jax.block_until_ready(state.params)

        def loss_fn(params, batch_stats, f, student=student):
            t_logits = jax.lax.stop_gradient(densify_topk(vals, idx, vocab))
            outs, _ = student.apply(
                {"params": params, "batch_stats": batch_stats},
                f, caps, True, False, False, False,
                method=lambda mdl, f_, c, tr, a, b_, d: mdl.distill_forward(
                    f_, c, tr, a, b_, d),
                mutable=["batch_stats"], rngs={"dropout": drng})
            return distillation_losses(
                student_logits=outs["logits"],
                teacher_logits=t_logits, targets=caps,
                weights=weights)["total"]

        def fwdbwd(v, f, loss_fn=loss_fn):
            return jax.grad(loss_fn, argnums=0)(
                v["params"], v["batch_stats"], f)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ms = scan_time(fwdbwd, variables, frames)
        print(f"  {label:22s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
