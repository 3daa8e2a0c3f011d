"""Distillation-loss unit tests (reference model.py:813-983 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu import distill


def test_kl_batchmean_semantics():
    """torch KLDivLoss(batchmean): elementwise-sum / batch size."""
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(3, 4, 7)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(3, 4, 7)).astype(np.float32))
    got = float(distill.kl_divergence_loss(s, t))
    log_ps = jax.nn.log_softmax(s, -1)
    pt = jax.nn.softmax(t, -1)
    want = float(jnp.sum(pt * (jnp.log(pt) - log_ps)) / 3)
    assert abs(got - want) < 1e-5
    # identical distributions → 0
    assert abs(float(distill.kl_divergence_loss(s, s))) < 1e-6


def test_kl_temperature_scaling():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(2, 3, 5)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 3, 5)).astype(np.float32))
    k1 = float(distill.kl_divergence_loss(s, t, temperature=1.0))
    k2 = float(distill.kl_divergence_loss(s, t, temperature=4.0))
    assert k1 != k2


def test_ce_shift_and_ignore():
    # vocab 4; logits put all mass on the correct next token
    y = jnp.array([[1, 2, 3, 0]], jnp.int32)  # trailing pad ignored
    logits = jnp.full((1, 4, 4), -20.0)
    logits = logits.at[0, 0, 2].set(20.0)  # predicts y[1]=2
    logits = logits.at[0, 1, 3].set(20.0)  # predicts y[2]=3
    logits = logits.at[0, 2, 1].set(20.0)  # predicts y[3]=0 → ignored
    loss = float(distill.cross_entropy_loss(logits, y))
    assert loss < 1e-3  # padded position excluded

    wrong = logits.at[0, 0, 2].set(-20.0).at[0, 0, 1].set(20.0)
    assert float(distill.cross_entropy_loss(wrong, y)) > 1.0


def test_fmap_loss_zero_on_match():
    s = [jnp.ones((6, 8)) for _ in range(4)]
    t = [jnp.ones((2, 3, 8)) for _ in range(4)]  # [B, F, D] reshapes to [6, 8]
    assert float(distill.fmap_distillation_loss(s, t)) == 0.0


def test_decoder_loss_layer_mapping():
    # 2 student layers vs 4 teacher layers → teacher layers 1 and 3
    b, t, p, e = 2, 3, 5, 4
    s = [jnp.zeros((b, t, e)), jnp.ones((b, t, e))]
    teacher = [jnp.full((b, p + t, e), float(i)) for i in range(4)]
    loss = float(distill.decoder_distillation_loss(s, teacher, prefix_len=p))
    # layer0 vs teacher1: (0-1)^2 = 1; layer1 vs teacher3: (1-3)^2 = 4
    assert abs(loss - 2.5) < 1e-6


def test_total_active_combination():
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
    y = jnp.array([[1, 2, 3, 0], [2, 1, 0, 0]], jnp.int32)
    out = distill.distillation_losses(student_logits=s, teacher_logits=t,
                                      targets=y)
    assert set(out) == {"kl", "ce", "total"}
    assert abs(float(out["total"]) - float(out["kl"]) - float(out["ce"])) < 1e-5
