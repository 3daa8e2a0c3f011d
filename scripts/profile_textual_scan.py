"""Scan-isolated (device-time) dissection of the GIT textual head
(VERDICT r2 item #8): the head runs at 74 TFLOP/s vs the CLIP tower's
110 — attribute the 19.9 ms to attention vs GEMMs vs LN vs the 30522-way
output head, with analytic FLOPs per part so each row carries its own
achieved-TFLOP/s column.

The earlier scripts/profile_textual.py used the pipelined-fetch method,
whose ~30 ms RTT floor makes every sub-20 ms part read as "~33 ms"
(docs/PERF.md §4); this one uses the scan method, the only honest way to
time sub-10 ms programs over the tunnel.

Usage: python scripts/profile_textual_scan.py [reps]
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

    def scan_time(apply, x):
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
            np.asarray(f(tvars, x))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(tvars, x))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    def bench(name, apply, shape, gflop):
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        ms = scan_time(apply, x)
        tf = gflop / ms  # GFLOP / ms == TFLOP/s
        print(f"{name:40s} {ms:8.3f} ms {gflop:8.1f} GF "
              f"{tf:7.1f} TF/s ({tf / V5E_BF16_TFLOPS:5.1%} peak)",
              flush=True)
        return ms

    def textual_method(fn):
        return lambda tv, x: teacher.apply(
            tv, x, method=lambda m, x_: fn(m.textual, x_))

    # analytic FLOPs (x2 for MAC)
    g_proj = 2 * batch * p_len * 1024 * d / 1e9
    g_qkvproj = 2 * batch * ltot * d * 4 * d / 1e9          # qkv + out proj
    g_attn = 2 * 2 * batch * 12 * ltot * ltot * 64 / 1e9    # QK^T + AV
    g_mlp = 2 * batch * ltot * d * 2 * 3072 / 1e9
    g_layer = g_qkvproj + g_attn + g_mlp
    g_head = 2 * batch * t_len * d * 30522 / 1e9

    bench("visual proj + LN", textual_method(
        lambda tx, v: tx.project_visual(v)), (batch, p_len, 1024), g_proj)

    def layers_fn(n):
        def run(tx, x):
            for layer in tx.layers[:n]:
                x = layer(x, prefix_len=p_len)
            return x
        return run

    for tag, minkv in (("pallas", 512), ("xla", 10 ** 9)):
        A.set_pallas_min_kv_len(minkv)
        bench(f"1 joint layer ({tag} attn)", textual_method(layers_fn(1)),
              (batch, ltot, d), g_layer)
        bench(f"6 joint layers ({tag} attn)", textual_method(layers_fn(6)),
              (batch, ltot, d), 6 * g_layer)
    A.set_pallas_min_kv_len(512)

    # attention op alone at the joint shape, pallas vs xla
    qkv_shape = (batch, 12, ltot, 64)
    q = jnp.asarray(rng.normal(size=qkv_shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=qkv_shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=qkv_shape), jnp.bfloat16)

    def attn_only(use_pallas):
        def apply(_, x):
            A.set_pallas_min_kv_len(512 if use_pallas else 10 ** 9)
            return A.multi_head_attention(x, k, v, causal=True,
                                          prefix_len=p_len)
        return apply

    for tag, flag in (("pallas", True), ("xla", False)):
        x = q
        ms = scan_time(attn_only(flag), x)
        tf = g_attn / ms
        print(f"{'attn op 8x12x1582x64 (' + tag + ')':40s} {ms:8.3f} ms "
              f"{g_attn:8.1f} GF {tf:7.1f} TF/s "
              f"({tf / V5E_BF16_TFLOPS:5.1%} peak)", flush=True)
    A.set_pallas_min_kv_len(512)

    bench("output head [8,40]x30522", textual_method(
        lambda tx, x: tx.output(x)), (batch, t_len, d), g_head)

    g_full = g_proj + 6 * g_layer + g_head
    bench("full textual fwd (logits)",
          lambda tv, v: teacher.apply(
              tv, v, caps, method=lambda m, v_, c_: m.textual(v_, c_)[0]),
          (batch, p_len, 1024), g_full)


if __name__ == "__main__":
    main()
