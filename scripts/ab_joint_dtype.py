"""A/B the Pallas score-matmul operand dtype at the teacher joint shape
(docs/PERF.md §1c follow-up): round-2 shipping upcasts q/k to f32 before
the QKᵀ dot; `native_score_dot=True` hands the raw bf16 operands to the
MXU (exact same products, f32 accumulation — parity pinned by
tests/test_ops.py::test_pallas_native_score_dot_parity).

Measures the in-context cost — 6 joint layers of the full-size teacher,
scan-isolated — for both arms, plus f32-softmax vs layer output deltas.

Usage: python scripts/ab_joint_dtype.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.models.clip_vit import clip_vit_l14_config
    from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher
    from rtvc_tpu.ops import attention as A

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch, t_len, p_len, d = 8, 40, 1542, 768
    ltot = p_len + t_len

    cfg = GITConfig(dtype=jnp.bfloat16,
                    clip=clip_vit_l14_config(dtype=jnp.bfloat16))
    teacher = GITTeacher(cfg)
    frames = jnp.zeros((1, 6, 224, 224, 3), jnp.float32)
    caps = jnp.zeros((batch, t_len), jnp.int32)
    tvars = jax.jit(teacher.init)(jax.random.PRNGKey(0), frames, caps[:1])
    jax.block_until_ready(tvars)
    print(f"backend={jax.default_backend()} reps={reps} batch={batch}",
          flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, ltot, d)), jnp.bfloat16)

    def layers6(tv, xx):
        def run(m, x_):
            for layer in m.textual.layers:
                x_ = layer(x_, prefix_len=p_len)
            return x_
        return teacher.apply(tv, xx, method=run)

    def scan_time(apply):
        def run(n):
            def scanned(v, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    o = apply(v, first)
                    s = jnp.sum(o.astype(jnp.float32))[None]
                    return s * 1e-12, ()
                return jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(tvars, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(tvars, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    g_qkvproj = 2 * batch * ltot * d * 4 * d / 1e9
    g_attn = 2 * 2 * batch * 12 * ltot * ltot * 64 / 1e9
    g_mlp = 2 * batch * ltot * d * 2 * 3072 / 1e9
    gflop = 6 * (g_qkvproj + g_attn + g_mlp)

    outs = {}
    for tag, flag in (("f32-upcast (shipping)", False),
                      ("native bf16 operands", True)):
        A.set_score_dot_native(flag)
        ms = scan_time(layers6)
        tf = gflop / ms
        outs[tag] = np.asarray(jax.jit(layers6)(tvars, x), np.float32)
        print(f"6 joint layers, {tag:24s} {ms:8.3f} ms {tf:6.1f} TF/s "
              f"({tf / V5E_BF16_TFLOPS:5.1%} peak)", flush=True)
    A.set_score_dot_native(False)

    a, b = outs.values()
    denom = np.maximum(np.abs(a), 1e-6)
    print(f"output delta: max abs {np.abs(a - b).max():.3e}  "
          f"max rel {(np.abs(a - b) / denom).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
