"""A/B: raw teacher-shape GEMMs — bf16 XLA vs XLA int8 vs Pallas W8A8.

VERDICT r4 #4 / ROADMAP #8: the XLA int8 route measured 1.06x SLOWER than
bf16 end-to-end (scripts/ab_int8_step.py, docs/PERF.md) because this XLA
build does not lower dot_general(int8, int8 -> int32) onto the v5e MXU's
doubled int8 rate. This script gives the per-GEMM verdict for the explicit
Pallas kernel (rtvc_tpu/ops/int8_gemm.py) at the frozen teacher's hot
shapes (reference hot loop: model.py:747-760):

  textual head (GIT-B/16, batch 8, joint seq 1582): K=768, N in
  {2304 qkv, 3072 mlp+, 768 mlp-, 30522 vocab head}, M=12656
  CLIP ViT-L/14 encode (48 frame-images x 257 tokens): K=1024, N in
  {3072 qkv, 4096 mlp+, 1024 mlp-}, M=12336

Arms per shape:
  bf16      — jnp bf16 matmul + bias (the production teacher dtype)
  xla-int8  — ops.quantization.int8_matmul (dynamic per-token act quant)
  pallas    — ops.int8_gemm.w8a8_dense (same dynamic quant, Pallas MXU core)
  pallas-pq — ops.int8_gemm.w8a8_matmul on PRE-quantized activations
              (kernel-only upper bound; excludes the act-quant pass)

Timing: scan-isolated (memory axon-tunnel-benchmarking): each arm runs
inside ONE jitted lax.scan whose carry perturbs a FLOAT input (the
activation for bf16/pallas, the act-scale for pallas-pq, never the int8
payload — an int8 += 1e-12 carry rounds to zero and lets XLA hoist the
whole GEMM out of the loop) with a full-output reduction folded back in.

Usage: python scripts/ab_int8_pallas_gemm.py [reps]
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
    from rtvc_tpu.ops import int8_gemm, quantization

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)

    def scan_time(make_op):
        """make_op(carry_scalar) -> output leaf; carry must reach a float
        operand so no iteration is loop-invariant."""
        def run(n):
            def body(carry, _):
                o = make_op(carry)
                s = jnp.sum(o.astype(jnp.float32))[None]
                return s * 1e-12, ()
            f = jax.jit(lambda: jax.lax.scan(
                body, jnp.zeros((1,), jnp.float32), None, length=n)[0])
            for attempt in range(4):
                try:        # transient remote_compile drops (PERF.md §4)
                    np.asarray(f())
                    break
                except Exception as e:  # pragma: no cover - tunnel flake
                    if attempt == 3:
                        raise
                    print(f"  retry after: {type(e).__name__}", flush=True)
                    time.sleep(5)
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f())
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    cases = [
        ("tx qkv   ", 8 * 1582, 768, 2304),
        ("tx mlp+  ", 8 * 1582, 768, 3072),
        ("tx mlp-  ", 8 * 1582, 3072, 768),
        ("tx vocab ", 8 * 1582, 768, 30522),
        ("clip qkv ", 48 * 257, 1024, 3072),
        ("clip mlp+", 48 * 257, 1024, 4096),
        ("clip mlp-", 48 * 257, 4096, 1024),
    ]

    print(f"{'case':11s} {'bf16':>9s} {'xla-i8':>9s} {'pallas':>9s} "
          f"{'pallas-pq':>9s}   pallas vs bf16", flush=True)
    geo = []
    for name, m, k, n in cases:
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
        wq, sw = quantization.quantize_weight(w)
        xq, sx = quantization.quantize_activations(x)
        xf32 = x.astype(jnp.float32)
        sxf = sx.astype(jnp.float32)
        jax.block_until_ready((x, w, b, wq, sw, xq, sxf))
        flops = 2.0 * m * k * n

        t_bf16 = scan_time(
            lambda c: (x + c.astype(x.dtype)) @ w + b.astype(x.dtype))
        t_xla = scan_time(
            lambda c: quantization.int8_matmul(
                xf32 + c, wq, sw, b, out_dtype=jnp.bfloat16))
        t_pl = scan_time(
            lambda c: int8_gemm.w8a8_dense(
                xf32 + c, wq, sw, bias=b, out_dtype=jnp.bfloat16))
        t_pq = scan_time(
            lambda c: int8_gemm.w8a8_matmul(
                xq, sxf + c, wq, sw, bias=b, out_dtype=jnp.bfloat16))

        def tf(t):
            return flops / (t * 1e-3) / 1e12

        speed = t_bf16 / t_pl
        geo.append(speed)
        print(f"{name} {t_bf16:7.3f}ms {t_xla:7.3f}ms {t_pl:7.3f}ms "
              f"{t_pq:7.3f}ms   {speed:5.2f}x  "
              f"(bf16 {tf(t_bf16):5.1f} / pallas {tf(t_pl):5.1f} TFLOP/s)",
              flush=True)

    g = float(np.exp(np.mean(np.log(geo))))
    print(f"geomean pallas-vs-bf16 speedup: {g:.2f}x", flush=True)


if __name__ == "__main__":
    main()
