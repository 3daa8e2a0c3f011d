"""Device mesh + sharding layer (TPU-native parallelism).

The reference had NO first-party parallelism — Lightning ``strategy: 'auto'``
(reference config.py:69) would have picked NCCL DDP on multi-GPU
(train.py:219-220). The TPU-native equivalent is a ``jax.sharding.Mesh``
with NamedSharding annotations; XLA inserts the collectives (gradient
``psum`` over the ``dp`` axis rides ICI, parameter all-gathers for the
tensor-parallel ``tp`` axis likewise).

Strategy for this model family (SURVEY.md §2b):
- ``dp``: batch data parallelism — the primary axis (student ≈ 33 M params,
  batch 8-per-chip scales linearly);
- ``tp``: optional tensor parallelism for the widest matmuls — the 30522-way
  vocab projection and embedding tables are sharded over ``tp`` (they
  dominate the student decoder's parameter bytes); everything else is
  replicated. With tp=1 this degenerates to pure DP at zero cost.

Gradient reduction is implicit: the loss is a mean over the global batch,
so XLA emits a reduce-scatter/all-reduce over ``dp`` during backprop under
``jit`` with sharded inputs + replicated (or tp-sharded) params.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

# parameter-path regexes → PartitionSpec for the weight's LAST axes.
# Paths are '/'-joined flax param paths.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # student vocab projection [d_model, vocab] → shard vocab over tp
    (r".*\blinear/kernel$", P(None, "tp")),
    (r".*\blinear/bias$", P("tp")),
    # embedding tables [vocab, d_model] → shard vocab over tp
    (r".*\bembed/embedding$", P("tp", None)),
    # teacher textual output head + word embeddings
    (r".*\btextual/output/kernel$", P(None, "tp")),
    (r".*\btextual/output/bias$", P("tp")),
    (r".*\bword_embeddings/embedding$", P("tp", None)),
)


def make_mesh(mesh_shape: Sequence[int] = (-1, 1),
              axes: Sequence[str] = ("dp", "tp"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over the available devices; -1 = all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, tuple(axes))


def shard_batch(batch: PyTree, mesh: Mesh) -> PyTree:
    """Place a host batch with leading-axis sharding over ``dp``."""
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        x = jax.numpy.asarray(x)
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree: PyTree, mesh: Mesh) -> PyTree:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_shardings(params: PyTree, mesh: Mesh) -> PyTree:
    """NamedSharding tree for params: tp rules above, replicated otherwise."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path) -> P:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if mesh.shape.get("tp", 1) > 1:
            for pattern, spec in _TP_RULES:
                if re.match(pattern, name):
                    return spec
        return P()

    specs = {jax.tree_util.keystr(path): spec_for(path) for path, _ in flat}

    def assign(path, leaf):
        return NamedSharding(mesh, specs[jax.tree_util.keystr(path)])

    return jax.tree_util.tree_map_with_path(assign, params)


def data_parallel_shardings(mesh: Mesh, batch_example: PyTree) -> PyTree:
    """NamedSharding tree for a batch pytree: leading axis over ``dp``."""
    def spec(x):
        return NamedSharding(mesh, P("dp", *([None] * (np.ndim(x) - 1))))
    return jax.tree.map(spec, batch_example)


def place_params(params: PyTree, mesh: Mesh) -> PyTree:
    """device_put params according to ``param_shardings``."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
