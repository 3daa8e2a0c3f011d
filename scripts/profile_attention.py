"""A/B the attention paths (XLA vs Pallas) at this workload's hot shapes.

Usage: python scripts/profile_attention.py [reps]

Shapes:
  - CLIP ViT-L/14 encode, batch 8 clips x 6 frames: [48, 16, 257, 64]
  - GIT textual head joint self-attention:          [8, 12, 1582, 64]
  - student decoder self-attention (training):      [8, 8, 40, 72]

Also asserts Pallas == XLA numerically (the no-copy partial-block path
relies on Mosaic masking tile padding; this is the empirical check).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401  (compile cache)
    from rtvc_tpu.ops import attention as A

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()}")

    shapes = [
        ("clip 48x16x257x64", (48, 16, 257, 64), (48, 16, 257, 64), False, 0),
        ("joint 8x12x1582x64 pc1542", (8, 12, 1582, 64), (8, 12, 1582, 64),
         True, 1542),
        ("student-self 8x8x40x72", (8, 8, 40, 72), (8, 8, 40, 72), True, 0),
    ]
    rng = np.random.default_rng(0)

    for name, qs, ks, causal, plen in shapes:
        # Device-time measurement that the axon tunnel cannot distort: all
        # reps run inside ONE jitted lax.scan over stacked UNIQUE inputs
        # (the tunnel dedupes repeated identical dispatches and its
        # block_until_ready is unreliable), and one tiny value fetch
        # synchronizes. t(scan_N) - t(scan_1) isolates (N-1) executions.
        q = jnp.asarray(rng.normal(size=qs), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=ks), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=ks), jnp.bfloat16)

        xla = jax.jit(lambda q, k, v: A.xla_attention(
            q, k, v, causal=causal, prefix_len=plen))
        pal = jax.jit(lambda q, k, v: A.flash_attention(
            q, k, v, causal=causal, prefix_len=plen))

        ox = xla(q, k, v)
        try:
            op = pal(q, k, v)
        except Exception as e:
            print(f"{name:30s} pallas FAILED: {type(e).__name__}: {e}")
            continue
        err = float(jnp.max(jnp.abs(ox.astype(jnp.float32)
                                    - op.astype(jnp.float32))))
        assert err < 0.02, f"{name}: pallas != xla, max err {err}"

        def bench(base_fn):
            def scan_of(n):
                def body(carry, i):
                    # fold the step index into q so every iteration is a
                    # distinct computation with a data dependency
                    o = base_fn(q + carry.astype(q.dtype), k, v)
                    # full reduction: a 1-element slice would let XLA DCE
                    # most of its (non-opaque) attention computation
                    return jnp.sum(o.astype(jnp.float32))[None] * 1e-12, ()
                f = jax.jit(lambda q, k, v: jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), jnp.arange(n))[0])
                np.asarray(f(q, k, v))  # warm (compile)
                t0 = time.perf_counter()
                for _ in range(3):
                    np.asarray(f(q, k, v))
                return (time.perf_counter() - t0) / 3
            t1, tn = scan_of(1), scan_of(1 + reps)
            return max(tn - t1, 1e-9) / reps * 1e3

        tx = bench(lambda q, k, v: A.xla_attention(
            q, k, v, causal=causal, prefix_len=plen))
        tp = bench(lambda q, k, v: A.flash_attention(
            q, k, v, causal=causal, prefix_len=plen))
        flops = 4 * qs[0] * qs[1] * qs[2] * ks[2] * qs[3]
        print(f"{name:30s} xla {tx:7.3f} ms  pallas {tp:7.3f} ms  "
              f"(x{tx / tp:4.2f})  err {err:.2e}  "
              f"pallas {flops / tp / 1e9:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
