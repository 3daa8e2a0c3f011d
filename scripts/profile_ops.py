"""Scan-isolated per-op device costs at the teacher's hot shapes.

Builds the cost table that explains the teacher-forward wall time:
GEMMs, LayerNorm, residual add+LN, QuickGELU, head transposes — each at
CLIP-encode and textual-head shapes. See memory note axon-tunnel-benchmarking
for why ops are timed inside one jitted lax.scan.
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
    from rtvc_tpu.ops.layernorm import _ln_reference

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    def scan_time(op, *arrays):
        """(t(scan_{1+reps}) - t(scan_1)) / reps, with a data-dependent
        carry folded into the first input so no iteration can be deduped."""
        def run(n):
            def body(carry, _):
                first = arrays[0] + carry.astype(arrays[0].dtype)
                o = op(first, *arrays[1:])
                leaf = jax.tree.leaves(o)[0]
                # full-output reduction: a 1-element slice would let XLA
                # DCE most of the op (observed "1e9 TFLOP/s" matmuls)
                s = jnp.sum(leaf.astype(jnp.float32))[None]
                return s * 1e-12, ()
            f = jax.jit(lambda *a: jax.lax.scan(
                body, jnp.zeros((1,), jnp.float32), None, length=n)[0])
            np.asarray(f(*arrays))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(*arrays))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    def arr(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape), dtype)

    W = 1024
    rows = 48 * 257          # CLIP encode flattened tokens
    rows_tx = 8 * 1582       # textual head flattened tokens

    cases = [
        ("gemm qkv  [12336,1024]x[1024,3072]", lambda a, b: a @ b,
         [arr((rows, W)), arr((W, 3 * W))], 2 * rows * W * 3 * W),
        ("gemm mlp+ [12336,1024]x[1024,4096]", lambda a, b: a @ b,
         [arr((rows, W)), arr((W, 4 * W))], 2 * rows * W * 4 * W),
        ("gemm mlp- [12336,4096]x[4096,1024]", lambda a, b: a @ b,
         [arr((rows, 4 * W)), arr((4 * W, W))], 2 * rows * 4 * W * W),
        ("layernorm [12336,1024]", lambda a, s, b: _ln_reference(a, s, b, 1e-5),
         [arr((rows, W)), arr((W,), jnp.float32), arr((W,), jnp.float32)],
         None),
        ("add+layernorm [12336,1024]",
         lambda a, d, s, b: _ln_reference(a + d, s, b, 1e-5),
         [arr((rows, W)), arr((rows, W)), arr((W,), jnp.float32),
          arr((W,), jnp.float32)], None),
        ("quickgelu [12336,4096]",
         lambda a: a * jax.nn.sigmoid(1.702 * a), [arr((rows, 4 * W))], None),
        ("heads-transpose 48x257x16x64->bhld",
         lambda a: jnp.transpose(a.reshape(48, 257, 16, 64), (0, 2, 1, 3))
         .reshape(48, 16, 257, 64) * 1.0001, [arr((48, 257, 16 * 64))], None),
        ("xla attn clip in-ctx  [48,16,257,64]",
         lambda q: __import__("rtvc_tpu.ops.attention", fromlist=["x"])
         .xla_attention(*[jnp.transpose(q.reshape(48, 257, 16, 64),
                                        (0, 2, 1, 3))] * 3),
         [arr((48, 257, 16 * 64))], None),
        ("ln textual [12656,768]",
         lambda a, s, b: _ln_reference(a, s, b, 1e-12),
         [arr((rows_tx, 768)), arr((768,), jnp.float32),
          arr((768,), jnp.float32)], None),
        ("gemm head [320,768]x[768,30522]", lambda a, b: a @ b,
         [arr((8 * 40, 768)), arr((768, 30522))], 2 * 320 * 768 * 30522),
    ]
    for name, op, arrays, flops in cases:
        dt = scan_time(op, *arrays)
        tf = f"  {flops / (dt / 1e3) / 1e12:6.1f} TFLOP/s" if flops else ""
        print(f"{name:42s} {dt:8.3f} ms{tf}")


if __name__ == "__main__":
    main()
