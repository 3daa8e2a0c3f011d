"""A/B the round-4 window-attention Pallas kernel (VERDICT r3 #2):
whole-encoder forward at the training/serving shape (48 frames, bf16,
tanh GELU = shipping config), scan-isolated, plus the isolated cores.

Arms (whole encoder):
  xla        round-3 shipping: windows via xla_attention(bias=...)
  pallas     windows via ops.attention.window_attention (in-kernel bias)
  identity   attention core replaced by identity — the ceiling

Isolated cores at the three hot shapes (stage1 768x49x6, stage2
48x196x12, stage3 48x49x18, all D=32, bf16 + bf16 softmax).

Usage: python scripts/ab_window_pallas.py [reps]
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
    from rtvc_tpu.ops import attention as A

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    scale = 32 ** -0.5

    # ---- isolated cores ---------------------------------------------------
    def scan_time_fn(fn, args):
        def run(n):
            def scanned(a):
                def body(carry, _):
                    first = jax.tree.map(lambda t: t + carry.astype(t.dtype),
                                         a)
                    o = fn(*first)
                    return jnp.sum(o.astype(jnp.float32))[None] * 1e-12, ()
                return jax.lax.scan(body, jnp.zeros((1,), jnp.float32),
                                    None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(args))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(args))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    for name, w, n, h, blocks in (("stage1", 768, 49, 6, 2),
                                  ("stage2", 48, 196, 12, 6),
                                  ("stage3", 48, 49, 18, 2)):
        d = 32
        q, k, v = (jnp.asarray(rng.normal(size=(w, h, n, d)) * 0.1,
                               jnp.bfloat16) for _ in range(3))
        bias = jnp.asarray(rng.normal(size=(h, n, n)) * 0.1, jnp.float32)

        def xla_core(q, k, v, bias):
            return A.xla_attention(q, k, v, bias=bias[None], scale=scale,
                                   softmax_in_input_dtype=True)

        def pallas_core(q, k, v, bias):
            return A.window_attention(q, k, v, bias, scale=scale,
                                      softmax_in_input_dtype=True)

        ref = np.asarray(jax.jit(xla_core)(q, k, v, bias), np.float32)
        got = np.asarray(jax.jit(pallas_core)(q, k, v, bias), np.float32)
        delta = np.abs(ref - got).max()
        ms_x = scan_time_fn(xla_core, (q, k, v, bias))
        ms_p = scan_time_fn(pallas_core, (q, k, v, bias))
        print(f"  {name} core: xla {ms_x:7.3f}  pallas {ms_p:7.3f} ms "
              f"({ms_x / ms_p:4.2f}x, x{blocks} blocks; |delta| {delta:.4f})",
              flush=True)

    # ---- whole encoder ----------------------------------------------------
    x = jnp.asarray(rng.normal(size=(48, 224, 224, 3)), jnp.bfloat16)

    def scan_time(apply, variables):
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
            np.asarray(f(variables, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(variables, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    real_mha = A.multi_head_attention

    def identity_mha(q, k, v, **kw):
        return v

    cfg = tv.tiny_vit_21m_config(dtype=jnp.bfloat16, drop_path_rate=0.0,
                                 gelu_approximate=True)
    model = tv.TinyViT(cfg)
    variables = jax.jit(model.init)(key, x)
    apply = lambda v, xx: model.apply(v, xx, False)  # noqa: E731

    results = {}
    outs = {}
    for name in ("xla", "pallas", "identity"):
        A.set_window_pallas(name == "pallas")
        tv.multi_head_attention = identity_mha if name == "identity" \
            else real_mha
        ms = scan_time(apply, variables)
        results[name] = ms
        print(f"encoder {name:9s} {ms:8.3f} ms", flush=True)
        if name != "identity":
            outs[name] = [np.asarray(o, np.float32)
                          for o in jax.jit(apply)(variables, x)]
        tv.multi_head_attention = real_mha
    A.set_window_pallas(True)

    d = max(float(np.max(np.abs(a - b)))
            for a, b in zip(outs["xla"], outs["pallas"]))
    print(f"pallas-vs-xla max|delta| across stage maps: {d:.4f}")
    print(f"speedup {results['xla'] / results['pallas']:.3f}x; "
          f"remaining attention-core cost "
          f"{results['pallas'] - results['identity']:.3f} ms "
          f"(was {results['xla'] - results['identity']:.3f})")


if __name__ == "__main__":
    main()
