"""Bounded memorization pin (VERDICT r4 #1): the training graph must
produce LANGUAGE, not just a shrinking loss.

The flagship-scale demonstration lives in docs/LEARNING.md (recorded
2026-08-20 on the v5e: 2100 replay-cached steps drive the 65.83M student
to reproduce all 12 training captions; scripts/memorize_flagship.py).
This test distills the same property to CI scale: train the tiny pair on
TWO distinct SEP-terminated captions until greedy decode — the REAL
KV-cache decode path, with per-row SEP truncation (the serving exactness
contract) — reproduces them verbatim at the token-id level. A gradient
bug that merely shrinks loss without teaching next-token structure fails
this; so does a decode-path divergence from the teacher-forced program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rtvc_tpu import decode as decode_lib
from rtvc_tpu.distill import LossWeights
from rtvc_tpu.train import create_train_state, make_train_step

from test_train import synth_batch, tiny_pair

CAP_A = [101, 7, 23, 51, 12, 102]          # [CLS] w w w w [SEP]
CAP_B = [101, 99, 140, 30, 102, 0]         # shorter caption + pad


@pytest.mark.slow
def test_memorizes_two_captions_verbatim():
    student, teacher = tiny_pair()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(2, 2, 64, 64, 3)), jnp.float32)
    caps = jnp.asarray([CAP_A, CAP_B], jnp.int32)
    batch = {"frames": frames, "caption": caps}

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=3e-3)
    state = create_train_state(student, jax.random.PRNGKey(0),
                               synth_batch(b=2), tx)
    tvars = teacher.init(jax.random.PRNGKey(1), frames[:1], caps[:1])

    # the reference's active kl+ce combination; the KL target is a RANDOM
    # teacher (adversarial noise the real run never has), so CE must win
    # the argmax at every position — which is exactly the property under
    # test, at the flagship run's measured KL:CE equilibrium (LEARNING.md)
    step = make_train_step(student, teacher, tx,
                           weights=LossWeights(kl=0.25, ce=1.0),
                           donate=False)
    key = jax.random.PRNGKey(2)
    first = last = None
    for i in range(250):
        state, m = step(state, tvars, batch, key)
        if i == 0:
            first = float(m["total"])
    last = float(m["total"])
    assert np.isfinite(last) and last < first

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    toks = np.asarray(decode_lib.student_greedy(student, variables, frames,
                                                max_len=8))
    n_verbatim = 0
    for row, gt in zip(toks, (CAP_A, CAP_B)):
        sep = np.nonzero(row == 102)[0]
        if sep.size:
            row = row[:int(sep[0]) + 1]
        gt = [t for t in gt if t != 0]
        if list(row) == gt:
            n_verbatim += 1
    assert n_verbatim >= 1, (toks.tolist(), CAP_A, CAP_B)
