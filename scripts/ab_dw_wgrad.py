"""A/B the one-pass depthwise-3x3 wgrad (VERDICT r4 #5, docs/PERF.md §1d).

Whole-encoder fwd+bwd (grads wrt params, eval-mode BN — the roofline's
method) at the training shape (48 frames, bf16), scan-isolated:

  baseline        nn.Conv depthwise + XLA autodiff wgrad (the 4.2x stage0)
  onepass-xla     custom VJP, nine-einsum one-pass wgrad via XLA
  onepass-pallas  custom VJP, Pallas one-pass kernel (single read of x/dy)

Plus max |grad delta| vs baseline over all param grads (correctness in
context) and a stage0-only micro A/B (2xMBConv96 @56, where the anomaly
lives).

Usage: python scripts/ab_dw_wgrad.py [reps]
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
    from rtvc_tpu.ops import depthwise

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"backend={jax.default_backend()} reps={reps}", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(48, 224, 224, 3)), jnp.bfloat16)

    cfg = tv.tiny_vit_21m_config(dtype=jnp.bfloat16, drop_path_rate=0.0)
    model = tv.TinyViT(cfg)
    variables = jax.jit(model.init)(key, x)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, xx):
        outs = model.apply({"params": p, **rest}, xx, False)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
                   for o in outs)

    grad_fn = jax.grad(loss_fn)

    def scan_time(fn):
        def run(n):
            def scanned(p, xx):
                def body(carry, _):
                    first = xx + carry.astype(xx.dtype)
                    g = fn(p, first)
                    s = sum(jnp.sum(leaf.astype(jnp.float32))
                            for leaf in jax.tree.leaves(g))[None]
                    return s * 1e-12, ()
                return jax.lax.scan(
                    body, jnp.zeros((1,), jnp.float32), None, length=n)[0]
            f = jax.jit(scanned)
            np.asarray(f(params, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(params, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    real_pallas = depthwise.dw3x3_wgrad_pallas
    arms = [("baseline      ", False, None),
            ("onepass-xla   ", True, depthwise.dw3x3_wgrad_xla),
            ("onepass-pallas", True, real_pallas)]

    results, grads = {}, {}
    for name, flag, impl in arms:
        depthwise.set_dw_wgrad_pallas(flag)
        depthwise.dw3x3_wgrad_pallas = impl or real_pallas
        try:
            ms = scan_time(grad_fn)
            grads[name] = jax.tree.leaves(jax.jit(grad_fn)(params, x))
        finally:
            depthwise.set_dw_wgrad_pallas(False)
            depthwise.dw3x3_wgrad_pallas = real_pallas
        results[name] = ms
        print(f"{name} {ms:8.3f} ms  "
              f"({results['baseline      '] / ms:.2f}x vs baseline)",
              flush=True)

    for name in list(results)[1:]:
        d = max(float(np.max(np.abs(np.asarray(a, np.float32)
                                    - np.asarray(b, np.float32))))
                for a, b in zip(grads[name], grads["baseline      "]))
        print(f"{name} max|grad delta| vs baseline: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
