"""Dissect the GIT textual head's forward time (it runs at ~25 TFLOP/s
while the CLIP tower hits 74 — find the missing milliseconds).

Parts timed separately (pipelined, distinct inputs, per-rep tiny fetch):
  - visual projection + LN only
  - N joint layers, N in {1, 6}, with and without the Pallas attention
  - the 30522-way output head alone
  - full textual forward (logits only) and with all hidden states fetched
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
    from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher
    from rtvc_tpu.models.clip_vit import clip_vit_l14_config
    from rtvc_tpu.ops import attention as A

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    t_len, p_len = 40, 1542

    cfg = GITConfig(dtype=jnp.bfloat16,
                    clip=clip_vit_l14_config(dtype=jnp.bfloat16))
    teacher = GITTeacher(cfg)
    frames = jnp.zeros((1, 6, 224, 224, 3), jnp.float32)
    caps = jnp.zeros((batch, t_len), jnp.int32)
    tvars = jax.jit(teacher.init)(jax.random.PRNGKey(0), frames,
                                  caps[:1])
    jax.block_until_ready(tvars)
    print(f"backend={jax.default_backend()} batch={batch}")

    rng = np.random.default_rng(0)
    vis_inputs = [jnp.asarray(rng.normal(size=(batch, p_len, 1024)),
                              jnp.bfloat16) for _ in range(reps)]
    joint_inputs = [jnp.asarray(rng.normal(size=(batch, p_len + t_len, 768)),
                                jnp.bfloat16) for _ in range(reps)]
    text_inputs = [jnp.asarray(rng.normal(size=(batch, t_len, 768)),
                               jnp.bfloat16) for _ in range(reps)]

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf[..., 0], np.float32)

    def bench(name, jit_fn, inputs):
        fetch(jit_fn(tvars, inputs[0]))
        t0 = time.perf_counter()
        outs = [jit_fn(tvars, x) for x in inputs]
        for o in outs:
            fetch(o)
        dt = (time.perf_counter() - t0) / len(inputs) * 1e3
        print(f"{name:44s} {dt:8.2f} ms")
        return dt

    def textual_method(fn):
        return jax.jit(lambda tv, x: teacher.apply(
            tv, x, method=lambda m, x_: fn(m.textual, x_)))

    bench("visual proj + LN", textual_method(
        lambda tx, v: tx.project_visual(v)), vis_inputs)

    def layers_fn(n):
        def run(tx, x):
            for layer in tx.layers[:n]:
                x = layer(x, prefix_len=p_len)
            return x
        return run

    bench("1 joint layer  (pallas attn)", textual_method(layers_fn(1)),
          joint_inputs)
    bench("6 joint layers (pallas attn)", textual_method(layers_fn(6)),
          joint_inputs)

    A.set_pallas_min_kv_len(10 ** 9)
    bench("1 joint layer  (xla attn)", textual_method(layers_fn(1)),
          joint_inputs)
    bench("6 joint layers (xla attn)", textual_method(layers_fn(6)),
          joint_inputs)
    A.set_pallas_min_kv_len(512)

    bench("output head [B,40]x30522", textual_method(
        lambda tx, x: tx.output(x)), text_inputs)

    full = jax.jit(lambda tv, v: teacher.apply(
        tv, v, caps, method=lambda m, v_, c_: m.textual(v_, c_)[0]))
    bench("full textual fwd (logits only)", full, vis_inputs)


if __name__ == "__main__":
    main()
