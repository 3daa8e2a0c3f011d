"""Scan-isolated DEVICE-time dissection of the steady-state (cached
replay) train step: forward+losses vs +backward vs +Adam — the training
analog of scripts/profile_caption_step.py. Completes docs/PERF.md §3's
attribution: the 48.6 ms wall number is known; this splits the device
floor under it.

Arms (batch 8, top-K 128 replay, KL+CE weights — the shipping default):
  fwd      densify_topk + distill_forward + losses (value only)
  fwd+bwd  value_and_grad
  full     + Adam update, TrainState carried THROUGH the scan (chained
           steps — the true steady-state device program)

Usage: python scripts/profile_replay_step.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.config import cfg as app_cfg
    from rtvc_tpu.data.teacher_cache import densify_topk
    from rtvc_tpu.distill import LossWeights, distillation_losses
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.train import TrainState, create_train_state

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch, t_len, top_k, vocab = 8, 40, 128, 30522
    weights = LossWeights()
    print(f"backend={jax.default_backend()} batch={batch} top_k={top_k} "
          f"reps={reps}", flush=True)

    student = student_from_config(app_cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(batch, 6, 224, 224, 3))
                         .astype(np.float32))
    caps_np = rng.integers(1, 30000, size=(batch, t_len)).astype(np.int32)
    caps_np[:, 0] = 101
    caps = jnp.asarray(caps_np)
    vals = jnp.asarray(rng.normal(size=(batch, t_len, top_k))
                       .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, vocab, size=(batch, t_len, top_k))
                      .astype(np.int32))

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(student, jax.random.PRNGKey(1),
                               {"frames": frames, "caption": caps}, tx)
    jax.block_until_ready(state.params)
    drng = jax.random.PRNGKey(2)

    def loss_fn(params, batch_stats, f):
        t_logits = jax.lax.stop_gradient(densify_topk(vals, idx, vocab))
        outs, mutated = student.apply(
            {"params": params, "batch_stats": batch_stats},
            f, caps, True, False, False, False,
            method=lambda mdl, f_, c, tr, a, b_, d: mdl.distill_forward(
                f_, c, tr, a, b_, d),
            mutable=["batch_stats"], rngs={"dropout": drng})
        losses = distillation_losses(
            student_logits=outs["logits"], teacher_logits=t_logits,
            targets=caps, weights=weights)
        return losses["total"], mutated["batch_stats"]

    def scan_arm(body, st0=None):
        """body(carry_state, f) -> (carry_state, scalar); scalar folded
        into the next iteration's frames to defeat DCE/dedup. ``st0``
        lets an arm start from a different TrainState (e.g. a different
        optimizer's opt_state) without duplicating the harness."""
        st0 = state if st0 is None else st0

        def make(n):
            def prog(st, f0):
                def sbody(c, _):
                    st_c, acc = c
                    st_n, s = body(st_c, f0 + acc * 1e-20)
                    return (st_n, s), ()
                (st_f, acc), _ = jax.lax.scan(
                    sbody, (st, jnp.float32(0.0)), None, length=n)
                return acc
            return prog

        def timed(fn):
            f = jax.jit(fn)
            np.asarray(f(st0, frames))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(st0, frames))
            return (time.perf_counter() - t0) / 3

        t1 = timed(make(1))
        tn = timed(make(1 + reps))
        return (tn - t1) / reps * 1e3

    # fwd only
    def fwd_body(st, f):
        loss, _ = loss_fn(st.params, st.batch_stats, f)
        return st, loss
    ms_fwd = scan_arm(fwd_body)
    print(f"{'fwd (densify+forward+losses)':36s} {ms_fwd:8.2f} ms",
          flush=True)

    # fwd + bwd
    def bwd_body(st, f):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params, st.batch_stats, f)
        gs = sum(jnp.sum(g.astype(jnp.float32))
                 for g in jax.tree.leaves(grads))
        return st, loss + gs * 1e-20
    ms_bwd = scan_arm(bwd_body)
    print(f"{'fwd+bwd (value_and_grad)':36s} {ms_bwd:8.2f} ms  "
          f"(bwd alone ~{ms_bwd - ms_fwd:.2f})", flush=True)

    # full chained step (state carried through the scan)
    def full_body(st, f):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params, st.batch_stats, f)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        st2 = TrainState(params=new_params, batch_stats=new_stats,
                         opt_state=new_opt, step=st.step + 1)
        return st2, loss
    ms_full = scan_arm(full_body)
    print(f"{'full chained step (+Adam)':36s} {ms_full:8.2f} ms  "
          f"(adam+update ~{ms_full - ms_bwd:.2f}; wall via train(): "
          f"48.6 ms)", flush=True)

    # same, with PLAIN optax.adam — is inject_hyperparams (the plateau-LR
    # mechanism, train.set_learning_rate) costing device time per step?
    tx_plain = optax.adam(learning_rate=1e-4)
    opt_plain = jax.jit(tx_plain.init)(state.params)
    jax.block_until_ready(opt_plain)

    def full_plain_body(st, f):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params, st.batch_stats, f)
        updates, new_opt = tx_plain.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        st2 = TrainState(params=new_params, batch_stats=new_stats,
                         opt_state=new_opt, step=st.step + 1)
        return st2, loss

    state_plain = TrainState(params=state.params,
                             batch_stats=state.batch_stats,
                             opt_state=opt_plain, step=state.step)

    ms_plain = scan_arm(full_plain_body, state_plain)
    print(f"{'full chained step (plain adam)':36s} {ms_plain:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
