"""A/B the TinyViT window-attention core (docs/PERF.md §1b lever 2).

The identity-attention arm bounded ANY win at -8.85 ms per 48-frame
encode; the sub-op profile shows the core running at ~1 TF/s effective —
far below even the K=32-limited MXU ceiling (~49 TF/s), so the cost is
layout/softmax overhead, not FLOPs. Arms measure the isolated attention
core at BOTH hot shapes (stage1: 768 windows x 49 tok x 6 heads x 32;
stage2: 48 x 196 x 12 x 32), scan-isolated:

  baseline     xla_attention on [B,H,N,D] incl. the qkv-reshape transposes
  direct       einsum in [B,N,H,D] layout, no transposes
  bf16sm       direct + bf16 scores/softmax (bias cast to bf16)
  sdpa         jax.nn.dot_product_attention (XLA's tuned SDPA path)
  packG        G windows packed into one attention with a block-diagonal
               bias mask (G x FLOPs for better MXU row/col tiling;
               stage1 only — stage2 has one window per frame)

Usage: python scripts/ab_window_attention.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(fn, args, reps):
    import jax
    import jax.numpy as jnp

    def run(n):
        def scanned(a):
            def body(carry, _):
                first = jax.tree.map(
                    lambda t: t + carry.astype(t.dtype) if t.dtype != np.int32
                    else t, a)
                o = fn(*first)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(o))[None]
                return s * 1e-12, ()
            return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None,
                                length=n)[0]
        f = jax.jit(scanned)
        np.asarray(f(args))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(args))
        return (time.perf_counter() - t0) / 3

    t1, tn = run(1), run(reps)
    return (tn - t1) / (reps - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.ops.attention import xla_attention

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)

    # (name, windows W, tokens N, heads H, blocks-in-model)
    shapes = [("stage1", 768, 49, 6, 2), ("stage2", 48, 196, 12, 6)]
    scale = 32 ** -0.5

    for name, w, n, h, blocks in shapes:
        d = 32
        # qkv as produced by the Dense: [W, N, 3*H*D] bf16
        qkv = jnp.asarray(rng.normal(size=(w, n, 3 * h * d)) * 0.1,
                          jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(h, n, n)) * 0.1, jnp.float32)

        def baseline(qkv, bias):
            x = qkv.reshape(w, n, h, 3, d)
            q, k, v = (x[..., i, :].transpose(0, 2, 1, 3) for i in range(3))
            o = xla_attention(q, k, v, bias=bias[None], scale=scale)
            return o.transpose(0, 2, 1, 3).reshape(w, n, h * d)

        def direct(qkv, bias):
            x = qkv.reshape(w, n, h, 3, d)
            q, k, v = (x[..., i, :] for i in range(3))  # [W, N, H, D]
            s = jnp.einsum("wnhd,wmhd->whnm", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s + bias[None], axis=-1).astype(v.dtype)
            o = jnp.einsum("whnm,wmhd->wnhd", p, v)
            return o.reshape(w, n, h * d)

        def bf16sm(qkv, bias):
            x = qkv.reshape(w, n, h, 3, d)
            q, k, v = (x[..., i, :] for i in range(3))
            s = jnp.einsum("wnhd,wmhd->whnm", q, k) * jnp.bfloat16(scale)
            p = jax.nn.softmax(s + bias[None].astype(s.dtype), axis=-1)
            o = jnp.einsum("whnm,wmhd->wnhd", p, v)
            return o.reshape(w, n, h * d)

        def sdpa(qkv, bias):
            x = qkv.reshape(w, n, h, 3, d)
            q, k, v = (x[..., i, :] for i in range(3))  # [W, N, H, D]
            o = jax.nn.dot_product_attention(
                q, k, v, bias=jnp.broadcast_to(bias[None], (w, h, n, n)),
                scale=scale)
            return o.reshape(w, n, h * d)

        arms = [("baseline", baseline), ("direct", direct),
                ("bf16sm", bf16sm), ("sdpa", sdpa)]

        ref = None
        for arm_name, fn in arms:
            try:
                out = jax.jit(fn)(qkv, bias)
                if ref is None:
                    ref = np.asarray(out, np.float32)
                else:
                    delta = np.abs(np.asarray(out, np.float32) - ref).max()
                    if delta > 0.05:
                        print(f"  {name} {arm_name}: PARITY FAIL {delta}")
                ms = scan_time(fn, (qkv, bias), reps)
                print(f"  {name} {arm_name:10s} {ms:7.3f} ms "
                      f"(x{blocks} blocks = {ms*blocks:6.2f})", flush=True)
            except Exception as e:  # arm unsupported on this jax
                print(f"  {name} {arm_name}: SKIP {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

        if name != "stage1":
            continue
        for g in (2, 4, 8):
            def packg(qkv, bias, g=g):
                x = qkv.reshape(w // g, g * n, h, 3, d)
                q, k, v = (x[..., i, :] for i in range(3))
                # block-diagonal bias: same-window blocks get the learned
                # bias, cross-window pairs -inf
                blockmask = jnp.kron(jnp.eye(g, dtype=jnp.float32),
                                     jnp.ones((n, n), jnp.float32)) > 0
                big = jnp.where(blockmask[None], jnp.tile(bias, (1, g, g)),
                                jnp.float32(-1e9))
                s = jnp.einsum("wnhd,wmhd->whnm", q, k,
                               preferred_element_type=jnp.float32) * scale
                p = jax.nn.softmax(s + big[None], axis=-1).astype(v.dtype)
                o = jnp.einsum("whnm,wmhd->wnhd", p, v)
                return o.reshape(w, n, h * d)
            out = jax.jit(packg)(qkv, bias)
            delta = np.abs(np.asarray(out, np.float32) - ref).max()
            ms = scan_time(packg, (qkv, bias), reps)
            print(f"  {name} pack{g:<7d} {ms:7.3f} ms "
                  f"(x{blocks} blocks = {ms*blocks:6.2f}) max|d|={delta:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
