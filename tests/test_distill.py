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


def test_weighted_loss_missing_inputs_raises():
    """A non-zero weighted loss with missing inputs must raise, never be a
    silent no-op (VERDICT r1 weak #3)."""
    import pytest
    from rtvc_tpu.distill import LossWeights, distillation_losses

    logits = jnp.zeros((2, 4, 7))
    tgt = jnp.zeros((2, 4), jnp.int32)
    base = dict(student_logits=logits, teacher_logits=logits, targets=tgt)
    for kwargs in (dict(weights=LossWeights(fmap=1.0)),
                   dict(weights=LossWeights(final_enc=1.0)),
                   dict(weights=LossWeights(ce_teacher=1.0)),
                   dict(weights=LossWeights(decoder=1.0))):
        with pytest.raises(ValueError, match="silent no-op"):
            distillation_losses(**base, **kwargs)
    # consensus mode needs its KD inputs; teacher_forced needs logits
    with pytest.raises(ValueError, match="silent no-op"):
        distillation_losses(student_logits=logits, teacher_logits=None,
                            targets=tgt,
                            weights=LossWeights(kd_source="beam_consensus"))
    with pytest.raises(ValueError, match="silent no-op"):
        distillation_losses(student_logits=logits, teacher_logits=None,
                            targets=tgt, weights=LossWeights())
    with pytest.raises(ValueError, match="unknown kd_source"):
        distillation_losses(**base, weights=LossWeights(kd_source="nope"))


def test_masked_kl_matches_unmasked_when_all_valid():
    from rtvc_tpu.distill import kl_divergence_loss, masked_kl_divergence_loss

    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(2, 5, 11)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 5, 11)).astype(np.float32))
    full = kl_divergence_loss(s, t, 2.0)
    masked = masked_kl_divergence_loss(s, t, jnp.ones((2, 5), bool), 2.0)
    np.testing.assert_allclose(np.asarray(full), np.asarray(masked), rtol=1e-5)
    # masking half the positions strictly reduces the sum
    half = masked_kl_divergence_loss(
        s, t, jnp.arange(5)[None, :] < 3, 2.0)
    assert float(half) < float(full)
