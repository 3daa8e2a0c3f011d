"""A/B the TinyViT encoder levers the sub-op dissection surfaced
(docs/PERF.md §1b): whole-encoder forward at the training shape
(48 frames, bf16, eval-mode BN), scan-isolated.

Arms:
  baseline        exact-erf GELU, real window attention
  gelu_tanh       cfg.gelu_approximate=True (tanh GELU)
  attn_identity   attention core replaced by identity (qkv/proj GEMMs kept)
                  — the in-context ceiling for ANY attention-core speedup
  both            gelu_tanh + attn_identity combined

Plus the max |delta| of the gelu_tanh outputs vs baseline (the numeric
cost of the approximation on converted timm weights).

Usage: python scripts/ab_encoder_levers.py [reps]
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

    results = {}
    outs = {}
    for name, approx, attn_id in (("baseline", False, False),
                                  ("gelu_tanh", True, False),
                                  ("attn_identity", False, True),
                                  ("both", True, True)):
        cfg = tv.tiny_vit_21m_config(dtype=jnp.bfloat16, drop_path_rate=0.0,
                                     gelu_approximate=approx)
        model = tv.TinyViT(cfg)
        tv.multi_head_attention = identity_mha if attn_id else real_mha
        variables = jax.jit(model.init)(key, x)
        apply = (lambda m: lambda v, xx: m.apply(v, xx, False))(model)
        ms = scan_time(apply, variables)
        results[name] = ms
        print(f"{name:16s} {ms:8.3f} ms", flush=True)
        if not attn_id:
            outs[name] = [np.asarray(o, np.float32)
                          for o in jax.jit(apply)(variables, x)]
        tv.multi_head_attention = real_mha

    d = max(float(np.max(np.abs(a - b)))
            for a, b in zip(outs["baseline"], outs["gelu_tanh"]))
    rel = max(float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
              for a, b in zip(outs["baseline"], outs["gelu_tanh"]))
    print(f"gelu_tanh max|delta| across stage maps: {d:.4f} "
          f"(max rel {rel:.2e})", flush=True)
    print(f"attention-core in-context cost: "
          f"{results['baseline'] - results['attn_identity']:.3f} ms; "
          f"erf-GELU in-context cost: "
          f"{results['baseline'] - results['gelu_tanh']:.3f} ms")


if __name__ == "__main__":
    main()
