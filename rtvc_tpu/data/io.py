"""Checkpoint I/O: orbax-backed save/restore + inference-loading helpers.

Replaces the reference's torch checkpoint plumbing (reference
src/utils/io.py:8-64 and Lightning ModelCheckpoint, config.py:47-54):

- ``save_checkpoint`` / ``restore_checkpoint``: orbax PyTree checkpoints of
  ``{params, batch_stats, opt_state, step, ...}`` — unlike the reference,
  optimizer state and step are restored, so mid-training resume actually
  works (the reference never restored optimizer state, SURVEY.md §5);
- ``load_kd_student_params``: reference ``load_kd_student_model``
  (io.py:8-35) — load a trained checkpoint and DROP the distillation-only
  heads (projectors/upsample/project/project_decoder) for inference;
- ``load_pruned_params``: reference ``load_pruned_model`` (io.py:38-64).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

PyTree = Any

_DISTILL_HEADS = ("projector_0", "projector_1", "projector_2", "projector_3",
                  "upsample", "project", "project_decoder")


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: PyTree, force: bool = True,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """``meta``: small JSON-able facts about how the weights were produced
    (e.g. which GELU variant the encoder was trained with). Stored as a
    sidecar ``<path>.meta.json`` — NOT inside the orbax tree, so restoring
    with an explicit ``target`` structure keeps working unchanged."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=force)
    if meta:
        import json
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def checkpoint_meta(path: str) -> Dict[str, Any]:
    """Sidecar metadata written by ``save_checkpoint(meta=...)``; ``{}``
    for checkpoints that predate it."""
    sidecar = os.path.abspath(path) + ".meta.json"
    if not os.path.exists(sidecar):
        return {}
    import json
    with open(sidecar) as f:
        return json.load(f)


class AsyncCheckpointSaver:
    """Background checkpoint writer.

    ``save_checkpoint`` blocks on a full device→host fetch of the train
    state plus the orbax disk write — tens of seconds for the ~500 MB
    student+optimizer tree over a slow device link. JAX arrays are
    immutable, so both can run on a worker thread while the train loop
    keeps dispatching steps against the SAME state snapshot; training
    only ever waits if the next epoch finishes before the previous save
    did (one save in flight at a time keeps checkpoints ordered).

    Errors surface on the next ``save``/``wait`` call rather than being
    swallowed. Replaces the synchronous epoch-end stall; the reference's
    Lightning ModelCheckpoint (reference config.py:47-54) was fully
    synchronous.
    """

    def __init__(self) -> None:
        import threading
        self._threading = threading
        self._thread: Optional[Any] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, tree: PyTree, force: bool = True,
             on_done: Optional[Any] = None,
             meta: Optional[Dict[str, Any]] = None) -> None:
        """Queue one checkpoint write; joins any still-running previous
        write first. ``on_done()`` runs on the worker after a successful
        save (e.g. stale-checkpoint pruning)."""
        self.wait()

        def work() -> None:
            try:
                save_checkpoint(path, tree, force=force, meta=meta)
                if on_done is not None:
                    on_done()
            except BaseException as e:  # re-raised on the caller's thread
                self._error = e

        self._thread = self._threading.Thread(
            target=work, name="ckpt-save", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) finishes; re-raise its
        error on this thread."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def restore_checkpoint(path: str, target: Optional[PyTree] = None) -> PyTree:
    ckptr = _checkpointer()
    if target is not None:
        import orbax.checkpoint as ocp
        return ckptr.restore(os.path.abspath(path),
                             args=ocp.args.PyTreeRestore(item=target))
    return ckptr.restore(os.path.abspath(path))


def strip_distillation_heads(params: Dict[str, Any]) -> Dict[str, Any]:
    """Drop projector/upsample/project/project_decoder params
    (reference io.py:27-34 deleted the same attributes for inference)."""
    return {k: v for k, v in params.items() if k not in _DISTILL_HEADS}


def load_kd_student_params(ckpt_path: str) -> Dict[str, Any]:
    """Load a distillation checkpoint and return inference-ready student
    params (distillation heads removed)."""
    tree = restore_checkpoint(ckpt_path)
    params = tree["params"] if "params" in tree else tree
    out = dict(tree) if "params" in tree else {"params": params}
    out["params"] = strip_distillation_heads(dict(params))
    return out


def load_pruned_params(ckpt_path: str) -> Dict[str, Any]:
    """Load a pruned checkpoint (masks already baked into the weights,
    reference pruning.py:52-53 + io.py:48-62)."""
    return load_kd_student_params(ckpt_path)


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Find the newest checkpoint dir under a run directory (the reference
    globbed ``results/run/<name>/*.ckpt``, inference.py:29-32)."""
    if not os.path.isdir(run_dir):
        return None
    # directories only: a checkpoint's ``.meta.json`` sidecar also starts
    # with "ckpt" and is written last, so a file match would win on mtime
    cands = [os.path.join(run_dir, d) for d in os.listdir(run_dir)
             if d.startswith("ckpt")
             and os.path.isdir(os.path.join(run_dir, d))]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)
