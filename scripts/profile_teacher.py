"""Component-level teacher/train-step timing on the current backend.

Usage: python scripts/profile_teacher.py [batch] [reps]

Times (pipelined, distinct inputs per rep, value-fetch to defeat the axon
tunnel's async caching — see memory notes):
  - CLIP tower alone (batch*frames images)
  - textual head alone (teacher-forced, precomputed visual)
  - full teacher-forced forward
  - full distillation train step (KL+CE)
Prints ms/op and achieved TFLOP/s vs the analytic FLOP count.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flops_clip(n_img, cfg):
    grid = cfg.image_size // cfg.patch_size
    l = grid * grid + 1
    w = cfg.width
    per_block = (
        2 * l * w * 3 * w          # qkv
        + 2 * l * l * w * 2        # QK^T + PV
        + 2 * l * w * w            # out proj
        + 2 * l * w * 4 * w * 2    # mlp
    )
    conv = 2 * l * (cfg.patch_size ** 2 * 3) * w
    return n_img * (conv + cfg.layers * per_block)


def flops_textual(b, p, t, c):
    l = p + t
    h = c.hidden_size
    per_layer = (
        2 * l * h * h * 3          # q,k,v
        + 2 * l * l * h * 2        # QK^T + PV
        + 2 * l * h * h            # attn out
        + 2 * l * h * c.feedforward_size * 2
    )
    head = 2 * t * h * c.vocab_size
    proj = 2 * p * c.visual_feature_size * h
    return b * (c.num_layers * per_layer + head + proj)


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    t_len = 40

    from rtvc_tpu.models.clip_vit import clip_vit_l14_config

    # clip carries its own dtype: GITConfig(dtype=...) covers only the
    # textual head (production teacher_from_config passes both)
    cfg = GITConfig(dtype=jnp.bfloat16,
                    clip=clip_vit_l14_config(dtype=jnp.bfloat16))
    teacher = GITTeacher(cfg)
    frames = jnp.zeros((batch, 6, 224, 224, 3), jnp.float32)
    caps = jnp.zeros((batch, t_len), jnp.int32)
    print(f"backend={jax.default_backend()} batch={batch} dtype={cfg.dtype}")

    t0 = time.perf_counter()
    tvars = jax.jit(teacher.init)(jax.random.PRNGKey(0), frames[:1], caps[:1])
    jax.block_until_ready(tvars)
    print(f"init: {time.perf_counter() - t0:.1f}s")

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf[..., 0], np.float32)

    def bench(name, fn, inputs, flops=None):
        """Pipelined: dispatch all reps with distinct inputs, fetch each
        (one ~27 ms tunnel RTT is amortized over the pipelined reps)."""
        fetch(fn(inputs[0]))
        t0 = time.perf_counter()
        outs = [fn(x) for x in inputs]
        for o in outs:
            fetch(o)
        dt = (time.perf_counter() - t0) / len(inputs)
        tf = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
        print(f"{name:28s} {dt * 1e3:8.2f} ms{tf}")
        return dt

    rng = np.random.default_rng(0)
    frame_inputs = [jnp.asarray(rng.normal(size=frames.shape),
                                jnp.float32) for _ in range(reps)]

    # NOTE: tvars must be a jit ARGUMENT, never a closure — closed-over
    # param trees become inline constants and the 788 MB constant payload
    # breaks the axon remote-compile RPC (observed: 30-min hang, then
    # "remote_compile ... Broken pipe").

    # 1. CLIP tower alone
    clip_jit = jax.jit(lambda tv, f: teacher.apply(
        tv, f, method=lambda m, x: m.encode_only(x)))
    clip_fn = lambda f: clip_jit(tvars, f)
    bench("clip encode (48 imgs)", clip_fn, frame_inputs,
          flops_clip(batch * 6, cfg.clip))

    # 2. textual head alone (teacher-forced)
    visual = clip_fn(frame_inputs[0])
    vis_inputs = [visual + i * 1e-6 for i in range(reps)]
    tex_jit = jax.jit(lambda tv, v: teacher.apply(
        tv, v, caps, method=lambda m, v_, c_: m.textual(v_, c_)[0]))
    bench("textual fwd (P=1542,T=40)", lambda v: tex_jit(tvars, v), vis_inputs,
          flops_textual(batch, 1542, t_len, cfg))

    # 3. full teacher-forced forward
    full_jit = jax.jit(lambda tv, f: teacher.apply(tv, f, caps))
    bench("teacher fwd full", lambda f: full_jit(tvars, f), frame_inputs,
          flops_clip(batch * 6, cfg.clip)
          + flops_textual(batch, 1542, t_len, cfg))

    # 4. full train step
    import optax
    from rtvc_tpu.train import create_train_state, make_train_step
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.config import cfg as app_cfg

    student = student_from_config(app_cfg)
    batch_ex = {"frames": frames, "caption": caps}
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    t0 = time.perf_counter()
    state = create_train_state(student, jax.random.PRNGKey(1), batch_ex, tx)
    jax.block_until_ready(state.params)
    print(f"student init: {time.perf_counter() - t0:.1f}s")
    step = make_train_step(student, teacher, tx, donate=False)
    step_rng = jax.random.PRNGKey(2)

    def step_fn(f):
        _, m = step(state, tvars, {"frames": f, "caption": caps}, step_rng)
        return m["total"]
    bench("train step (KL+CE)", step_fn, frame_inputs)

    # ---- scan-isolated PURE DEVICE times --------------------------------
    # The pipelined per-rep-fetch numbers above have a ~30 ms fetch-RTT
    # floor (what a training loop experiences over the tunnel); these are
    # the hardware-comparable times (docs/PERF.md §4).
    def scan_time(make_out, x0, n=6):
        def run(n_iters):
            def f_impl(tv, x):
                def body(carry, _):
                    o = make_out(tv, x + carry.astype(x.dtype))
                    return jnp.sum(o.astype(jnp.float32))[None] * 1e-12, ()
                return jax.lax.scan(body, jnp.zeros((1,), jnp.float32),
                                    None, length=n_iters)[0]
            f = jax.jit(f_impl)
            np.asarray(f(tvars, x0))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(tvars, x0))
            return (time.perf_counter() - t0) / 3
        return (run(1 + n) - run(1)) / n * 1e3

    dev_full = scan_time(lambda tv, f: teacher.apply(tv, f, caps),
                         frame_inputs[0], n=4)
    flops = (flops_clip(batch * 6, cfg.clip)
             + flops_textual(batch, 1542, t_len, cfg))
    print(f"{'teacher fwd full (device)':28s} {dev_full:8.2f} ms  "
          f"{flops / (dev_full / 1e3) / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
