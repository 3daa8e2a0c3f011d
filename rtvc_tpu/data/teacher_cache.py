"""Disk cache for frozen-teacher outputs across epochs (ROADMAP #10).

The teacher is frozen (reference model.py:741-745) and the reference pairs
each video with a FIXED caption for the whole run (``caption_ids.sample(n=1,
random_state=cfg['SEED'])`` — a fixed random_state returns the same caption
every epoch, reference dataloader.py:66 + train.py:167-199). The
teacher-forced logits for a (video, caption) pair are therefore identical in
every epoch; computing them once and replaying from disk removes the entire
teacher forward (the dominant ~4 TFLOP of the train step) from epoch 2 on.

Storage: one ``.npy`` per (vid_id, caption_id) key. bfloat16 logits are
widened to float32 on store (exact) and cast back on load (exact), so cached
and freshly-computed losses are BITWISE equal. An optional byte budget
evicts least-recently-used entries.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _sanitize(key: str) -> str:
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in key)


class TeacherLogitsCache:
    """``top_k=0`` (default): full-vocab rows, bitwise-exact replay.

    ``top_k=K``: store only each position's K largest logits + their vocab
    indices — ~240x smaller at K=128 (40 KB vs 4.9 MB per sample), which
    matters when the device is network-attached and the hit path is
    upload-bound (measured: full-logit uploads dominate the cached step
    over the axon tunnel). Replay is APPROXIMATE: the softmax tail is
    dropped and renormalized (see :func:`densify_topk`); exact only when
    K >= vocab."""

    def __init__(self, cache_dir: str, max_bytes: Optional[int] = None,
                 top_k: int = 0):
        self.cache_dir = cache_dir
        self.max_bytes = max_bytes
        self.top_k = int(top_k)
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _path(self, key: str) -> str:
        # K is part of the filename: changing teacher_cache_top_k between
        # runs against one cache_dir must MISS (and recompute), not silently
        # replay pairs truncated at the old K — that would quietly change
        # the distillation distribution relative to the configured K.
        ext = f".top{self.top_k}.npz" if self.top_k else ".npy"
        return os.path.join(self.cache_dir, _sanitize(key) + ext)

    @staticmethod
    def key(vid_id, caption_id) -> str:
        return f"{vid_id}__{caption_id}"

    def get_batch(self, keys: Sequence[str]):
        """If EVERY key hits (partial batches recompute whole — one step
        signature, no gather): stacked [B, T, V] float32 logits, or in
        top-k mode the pair (values [B, T, K], indices [B, T, K])."""
        rows: List[np.ndarray] = []
        idx_rows: List[np.ndarray] = []
        for key in keys:
            path = self._path(key)
            if not os.path.exists(path):
                self.misses += len(keys)
                return None
            if self.top_k:
                with np.load(path) as z:
                    rows.append(z["values"])
                    idx_rows.append(z["indices"])
            else:
                rows.append(np.load(path))
        self.hits += len(keys)
        for key in keys:  # touch for LRU recency
            try:
                os.utime(self._path(key), None)
            except OSError:
                pass
        if self.top_k:
            return np.stack(rows), np.stack(idx_rows)
        return np.stack(rows)

    def compress(self, logits: np.ndarray):
        """Dense [..., V] → (top-k values, indices) with this cache's K
        (no I/O — the miss path uses it so miss- and hit-epoch steps see
        the identical truncated distribution)."""
        logits = np.asarray(logits, dtype=np.float32)
        k = min(self.top_k, logits.shape[-1])
        idx = np.argpartition(logits, -k, axis=-1)[..., -k:]
        vals = np.take_along_axis(logits, idx, axis=-1)
        return vals.astype(np.float32), idx.astype(np.int32)

    def put_batch(self, keys: Sequence[str], logits) -> None:
        logits = np.asarray(logits, dtype=np.float32)  # bf16 → f32 is exact
        for key, row in zip(keys, logits):
            if self.top_k:
                vals, idx = self.compress(row)
                np.savez(self._path(key), values=vals, indices=idx)
            else:
                np.save(self._path(key), row)
        self._evict()

    def _evict(self) -> None:
        if self.max_bytes is None:
            return
        entries = []
        total = 0
        for fn in os.listdir(self.cache_dir):
            path = os.path.join(self.cache_dir, fn)
            try:
                st = os.stat(path)
            except OSError:
                continue
            entries.append((st.st_mtime, st.st_size, path))
            total += st.st_size
        entries.sort()  # oldest first
        for _, size, path in entries:
            if total <= self.max_bytes:
                break
            try:
                os.remove(path)
                total -= size
            except OSError:
                pass

    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses}


class CacheReplayFeed:
    """Background prefetcher for cached-teacher training epochs.

    Wraps a batch loader: while step N computes on device, a producer
    thread pulls batch N+1 from the loader, reads its cache entries from
    disk, and STARTS the host→device upload (``jax.device_put`` is
    asynchronous), so on the hit path neither the disk read nor the upload
    ever sits between two train steps. This mirrors the frames pipeline's
    own double-buffering (data/dataset.py DeviceLoader) — round 2 left the
    replay fully synchronous inside the step loop and the cached step LOST
    wall-clock to the live teacher (238-260 ms vs 161 ms) despite a 2.5×
    device-time win; see docs/PERF.md §3.

    Yields the loader's batch dicts augmented with:

    - ``_cache_keys``: per-row cache keys (always present);
    - on a full-vocab hit: ``teacher_logits`` (device, f32);
    - on a top-K hit: ``teacher_topk_vals`` / ``teacher_topk_idx`` (device)
      — the ~40 KB/sample pair; the dense tensor is rebuilt INSIDE the
      jitted train step (train.py), so it only ever exists in HBM.

    On a miss nothing is added; the consumer runs the live teacher (the
    device is busy with the current step anyway — epoch 1 is compute-bound,
    not IO-bound).
    """

    def __init__(self, loader, cache: "TeacherLogitsCache", mesh=None,
                 depth: int = 2):
        self.loader = loader
        self.cache = cache
        self.mesh = mesh
        self.depth = depth

    def _put(self, x: np.ndarray):
        import jax

        if jax.process_count() > 1:
            # multi-controller run: these are HOST-LOCAL rows of the global
            # batch. device_put with a NamedSharding over the multi-process
            # mesh would (wrongly) treat them as the full global value —
            # leave them on host; train.py's shard_host_local_batch
            # assembles the global array from the per-host shards. The
            # prefetch still overlaps the disk read with the running step.
            return x
        if self.mesh is not None and self.mesh.shape.get("dp", 1) > 1 \
                and x.shape[0] % self.mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P("dp", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return jax.device_put(x)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        errbox = []
        stop = threading.Event()  # set when the consumer abandons iteration

        def put_q(item) -> bool:
            """stop-aware bounded put; False = consumer abandoned us."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self.loader:
                    if "vid-id" not in batch or "caption-id" not in batch:
                        raise ValueError("teacher_cache needs 'vid-id' and "
                                         "'caption-id' in each batch")
                    keys = [self.cache.key(v, c) for v, c in
                            zip(batch["vid-id"], batch["caption-id"])]
                    out = dict(batch)
                    out["_cache_keys"] = keys
                    cached = self.cache.get_batch(keys)
                    if cached is not None:
                        if self.cache.top_k:
                            vals, idx = cached
                            out["teacher_topk_vals"] = self._put(vals)
                            out["teacher_topk_idx"] = self._put(idx)
                        else:
                            out["teacher_logits"] = self._put(cached)
                    if not put_q(out):
                        return
            except BaseException as e:  # surfaced on the consumer side
                errbox.append(e)
            finally:
                put_q(sentinel)

        thread = threading.Thread(target=producer, daemon=True,
                                  name="cache-replay-producer")
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if errbox:
                        raise errbox[0]
                    return
                yield item
        finally:
            # Runs on normal exhaustion AND when the consumer abandons the
            # generator mid-epoch (train-step exception): unblock and reap
            # the producer so no thread/device-upload leaks per failed epoch.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=5.0)


def densify_topk(values, indices, vocab_size: int):
    """Jit-friendly on-device reconstruction of dense [B, T, V] logits from
    the top-k pair: non-stored entries sit 100 below the row max, so their
    softmax probability underflows to exactly 0 in f32 — the distillation
    losses see the renormalized top-k distribution without any change to
    their dense-logit signatures. The 40 KB pair is what crosses the
    host→device link; the 4.9 MB dense tensor only ever exists in HBM."""
    import jax.numpy as jnp

    values = jnp.asarray(values, jnp.float32)
    indices = jnp.asarray(indices)
    b, t, _ = values.shape
    fill = jnp.max(values, axis=-1, keepdims=True) - 100.0
    dense = jnp.broadcast_to(fill, (b, t, vocab_size))
    return dense.at[jnp.arange(b)[:, None, None],
                    jnp.arange(t)[None, :, None], indices].set(values)
