"""Global L1 pruning tests (reference pruning.py:15-56 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtvc_tpu.pruning import (apply_masks, global_prune_params,
                              sparsity_report)


def _params():
    return {
        "layer": {"kernel": jnp.asarray(np.arange(1, 13, dtype=np.float32)
                                        .reshape(3, 4) / 12.0),
                  "bias": jnp.ones((4,)) * 1e-6},
        "norm": {"scale": jnp.asarray([0.01, 2.0, 3.0]),
                 "bias": jnp.zeros((3,))},
        "attn": {"in_proj_kernel": jnp.full((2, 6), 0.5),
                 "attention_biases": jnp.full((2, 2), 1e-9)},
        "embed": {"embedding": jnp.full((4, 2), 0.9)},
    }


def test_global_threshold_and_exclusions():
    params = _params()
    pruned, masks = global_prune_params(params, ratio=0.25)
    # biases and attention_biases are NOT prunable (torch 'weight' filter)
    np.testing.assert_array_equal(np.asarray(pruned["layer"]["bias"]),
                                  np.asarray(params["layer"]["bias"]))
    np.testing.assert_array_equal(np.asarray(pruned["attn"]["attention_biases"]),
                                  np.asarray(params["attn"]["attention_biases"]))
    # exactly 25% of prunable elements zeroed (12+3+12+8 = 35 → k=9)
    rep = sparsity_report(pruned)
    assert rep["total"] == 35
    assert rep["zeros"] == 9
    # smallest magnitudes went first: kernel 1/12..  and scale 0.01
    assert float(pruned["norm"]["scale"][0]) == 0.0
    assert float(pruned["norm"]["scale"][2]) == 3.0


def test_masks_and_reapply():
    params = _params()
    pruned, masks = global_prune_params(params, ratio=0.5)
    reapplied = apply_masks(params, masks)
    for a, b in zip(jax.tree.leaves(pruned), jax.tree.leaves(reapplied)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert masks["layer"]["bias"] is None


def test_ratio_zero_noop():
    params = _params()
    pruned, _ = global_prune_params(params, ratio=0.0)
    for a, b in zip(jax.tree.leaves(pruned), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pruned_model_still_decodes():
    """Prune a tiny student 50% and check greedy decode still runs."""
    import jax

    from rtvc_tpu import decode
    from test_models import tiny_student

    model = tiny_student(dropout=0.0)
    frames = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 64, 64, 3))
    y = jnp.array([[101, 5]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), frames, y)
    pruned, _ = global_prune_params(variables["params"], 0.5)
    rep = sparsity_report(pruned)
    assert 0.45 < rep["sparsity"] < 0.55
    tokens = decode.student_greedy(
        model, {"params": pruned,
                "batch_stats": variables.get("batch_stats", {})},
        frames, max_len=4)
    assert np.asarray(tokens).shape == (1, 5)
