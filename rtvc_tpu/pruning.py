"""Global L1 magnitude pruning on parameter pytrees.

Rebuilds ``global_prune_model`` (reference src/utils/pruning.py:15-56) for
JAX: the reference collected every named parameter containing 'weight'
(which in torch includes Dense/Conv kernels, MHA packed in_proj weights,
embedding tables AND LayerNorm/BatchNorm scales), ranked ALL their elements
globally by |w|, and zeroed the smallest ``ratio`` fraction
(``prune.global_unstructured(L1Unstructured)``), then baked the masks in
(``prune.remove``).

Here the same element set is selected by leaf name — the torch-'weight'
equivalents in our flax trees are ``kernel``, ``in_proj_kernel``,
``embedding`` and ``scale`` — the global threshold is the exact k-th
smallest magnitude (numpy partition on host, identical semantics to torch's
topk-based L1Unstructured), and masks are applied functionally. Masks can be
kept alongside the params for mask-respecting finetuning.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

# flax leaf names whose torch equivalents contain 'weight'
# (reference pruning.py:34: [p for p in named_parameters() if 'weight' in p[0]])
_PRUNABLE_LEAVES = ("kernel", "in_proj_kernel", "embedding", "scale")


def _is_prunable(path) -> bool:
    leaf_name = str(getattr(path[-1], "key", path[-1]))
    return leaf_name in _PRUNABLE_LEAVES


def global_prune_params(params: PyTree, ratio: float,
                        is_prunable: Optional[Callable] = None
                        ) -> Tuple[PyTree, PyTree]:
    """Zero the globally-smallest ``ratio`` fraction of prunable weights.

    Returns (pruned_params, masks) where masks has 1.0 for kept weights on
    prunable leaves and None (no mask) elsewhere.
    """
    is_prunable = is_prunable or _is_prunable
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    prunable = [(p, leaf) for p, leaf in flat if is_prunable(p)]
    if not prunable or ratio <= 0.0:
        return params, jax.tree.map(lambda _: None, params)

    magnitudes = np.concatenate(
        [np.abs(np.asarray(leaf, np.float32)).ravel() for _, leaf in prunable])
    k = int(round(ratio * magnitudes.size))
    if k <= 0:
        threshold, tie_budget = -1.0, 0
    else:
        # exact-k semantics like torch L1Unstructured's topk: prune all
        # elements strictly below the k-th smallest magnitude, then enough
        # threshold-ties (in flat traversal order) to reach exactly k
        threshold = float(np.partition(magnitudes, k - 1)[k - 1])
        below = int((magnitudes < threshold).sum())
        tie_budget = k - below

    # keep = |w| >= threshold, minus exactly ``tie_budget`` threshold-ties
    # (in flat traversal order, mirroring a deterministic topk tie-break)
    mask_by_path: Dict[str, np.ndarray] = {}
    remaining_ties = tie_budget
    for path, leaf in prunable:
        mag = np.abs(np.asarray(leaf, np.float32))
        keep = (mag >= threshold).ravel()
        if remaining_ties > 0:
            ties = np.flatnonzero((mag == threshold).ravel())
            take = ties[:remaining_ties]
            remaining_ties -= len(take)
            keep[take] = False
        mask_by_path[jax.tree_util.keystr(path)] = (
            keep.reshape(mag.shape).astype(np.float32))

    def apply_mask(path, leaf):
        mask = mask_by_path.get(jax.tree_util.keystr(path))
        if mask is None:
            return leaf
        return leaf * jnp.asarray(mask, leaf.dtype)

    def mask_of(path, leaf):
        mask = mask_by_path.get(jax.tree_util.keystr(path))
        return None if mask is None else jnp.asarray(mask, jnp.float32)

    pruned = jax.tree_util.tree_map_with_path(apply_mask, params)
    masks = jax.tree_util.tree_map_with_path(mask_of, params)
    return pruned, masks


def sparsity_report(params: PyTree) -> Dict[str, float]:
    """Fraction of exactly-zero elements among prunable leaves."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    zero = total = 0
    for path, leaf in flat:
        if _is_prunable(path):
            arr = np.asarray(leaf)
            zero += int((arr == 0).sum())
            total += arr.size
    return {"zeros": zero, "total": total,
            "sparsity": zero / max(total, 1)}


def apply_masks(params: PyTree, masks: PyTree) -> PyTree:
    """Re-apply stored masks (for mask-respecting finetune steps)."""
    return jax.tree.map(
        lambda p, m: p if m is None else p * m.astype(p.dtype),
        params, masks, is_leaf=lambda x: x is None)


def main(argv=None) -> None:
    """Sweep pruning ratios over a trained checkpoint (reference
    pruning.py:58-95: ratios 0.1-0.5 saved as separate checkpoints)."""
    from .data.io import (checkpoint_meta, load_kd_student_params,
                          save_checkpoint)

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out_dir", default="results/pruned")
    parser.add_argument("--ratios", type=float, nargs="+",
                        default=[0.1, 0.2, 0.3, 0.4, 0.5])
    args = parser.parse_args(argv)

    tree = load_kd_student_params(args.ckpt)
    meta = checkpoint_meta(args.ckpt)  # carry activation record forward
    for ratio in args.ratios:
        pruned, _ = global_prune_params(tree["params"], ratio)
        report = sparsity_report(pruned)
        out = dict(tree)
        out["params"] = pruned
        path = os.path.join(args.out_dir, f"pruned_{round(ratio, 1)}")
        save_checkpoint(path, out, meta=meta or None)
        print(f"ratio {ratio:.1f}: sparsity {report['sparsity']:.3f} → {path}")
    print("Done")


if __name__ == "__main__":
    main()
