"""In-context A/B: teacher forward with Pallas attention enabled at
different KV-length thresholds (whole-program effect, not op-level).

Usage: python scripts/ab_teacher_attention.py [batch] [reps]
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
    from rtvc_tpu.ops import attention as A

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from rtvc_tpu.models.clip_vit import clip_vit_l14_config

    # NB: clip needs its own dtype — GITConfig(dtype=...) covers only the
    # textual head; the default clip config is f32 (a round-2 profiling
    # bug: early teacher-encode numbers ran the CLIP tower in f32)
    cfg = GITConfig(dtype=jnp.bfloat16,
                    clip=clip_vit_l14_config(dtype=jnp.bfloat16))
    teacher = GITTeacher(cfg)
    frames = jnp.zeros((batch, 6, 224, 224, 3), jnp.float32)
    caps = jnp.zeros((batch, 40), jnp.int32)
    tvars = jax.jit(teacher.init)(jax.random.PRNGKey(0), frames[:1], caps[:1])
    jax.block_until_ready(tvars)

    rng = np.random.default_rng(0)
    frame_inputs = [jnp.asarray(rng.normal(size=frames.shape), jnp.float32)
                    for _ in range(reps)]

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf[..., 0], np.float32)

    from rtvc_tpu.ops import layernorm as L

    def run(label):
        full = jax.jit(lambda tv, f: teacher.apply(tv, f, caps))
        fetch(full(tvars, frame_inputs[0]))  # compile
        t0 = time.perf_counter()
        outs = [full(tvars, f) for f in frame_inputs]
        for o in outs:
            fetch(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:42s} teacher fwd {dt * 1e3:8.2f} ms")

    if "--add-ln" in sys.argv:
        # residual-add+LN kernel A/B at the production threshold
        for flag in (False, True, False):
            L.set_pallas_add_ln(flag)
            run(f"add_ln_kernel={flag}")
        return

    if "--blhd" in sys.argv:
        # layout-native CLIP attention kernel A/B (ROADMAP #7)
        for flag in (False, True, False):
            A.set_blhd_clip(flag)
            run(f"blhd_clip_kernel={flag}")
        return

    # thresholds: 192 = pallas for CLIP(257)+joint(1582); 512 = joint only
    # (round-1 default); 10**9 = XLA everywhere
    for thresh in (192, 512, 10**9):
        A.set_pallas_min_kv_len(thresh)
        run(f"min_kv_len={thresh}")


if __name__ == "__main__":
    main()
