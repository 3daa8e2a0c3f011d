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


def _compress_topk(logits: np.ndarray, top_k: int):
    """Dense [..., V] → (top-k values, indices). One implementation for
    both caches and for their miss AND hit paths, so miss- and hit-epoch
    steps always see the identical truncated distribution."""
    logits = np.asarray(logits, dtype=np.float32)
    k = min(top_k, logits.shape[-1])
    idx = np.argpartition(logits, -k, axis=-1)[..., -k:]
    vals = np.take_along_axis(logits, idx, axis=-1)
    return vals.astype(np.float32), idx.astype(np.int32)


def _atomic_save(path: str, save_fn) -> None:
    """Write-to-temp + rename. Entries are read by the CacheReplayFeed
    producer thread (and, vid-keyed, can recur across nearby batches)
    while the train loop's miss path writes them — a reader must never
    see a half-written file, and a SIGKILL mid-write must not leave a
    permanently corrupt entry every later epoch crashes on. os.replace
    is atomic on POSIX. The temp name carries pid AND thread id: two
    threads of one process saving the same key must not share a temp path
    (they would clobber/unlink each other's half-written file)."""
    import threading

    tmp = path + f".tmp{os.getpid()}_{threading.get_ident()}"
    try:
        save_fn(tmp)
        # np.save/np.savez append .npy/.npz to names without that suffix
        written = tmp if os.path.exists(tmp) else next(
            t for t in (tmp + ".npy", tmp + ".npz") if os.path.exists(t))
        os.replace(written, path)
    except BaseException:
        for t in (tmp, tmp + ".npy", tmp + ".npz"):
            try:
                os.remove(t)
            except OSError:
                pass
        raise


def _load_or_none(path: str, loader):
    """A concurrently-evicted / still-being-written / corrupt entry is a
    MISS (recompute + rewrite), never a crash."""
    import zipfile

    try:
        return loader(path)
    except (OSError, ValueError, KeyError, EOFError, zipfile.BadZipFile):
        return None


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
            if self.top_k:
                def _ld(p):
                    with np.load(p) as z:
                        return z["values"], z["indices"]
                pair = _load_or_none(path, _ld)
                if pair is None:
                    self.misses += len(keys)
                    return None
                rows.append(pair[0])
                idx_rows.append(pair[1])
            else:
                row = _load_or_none(path, np.load)
                if row is None:
                    self.misses += len(keys)
                    return None
                rows.append(row)
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
        return _compress_topk(logits, self.top_k)

    def put_batch(self, keys: Sequence[str], logits) -> None:
        logits = np.asarray(logits, dtype=np.float32)  # bf16 → f32 is exact
        for key, row in zip(keys, logits):
            if self.top_k:
                vals, idx = self.compress(row)
                _atomic_save(self._path(key),
                             lambda p: np.savez(p, values=vals, indices=idx))
            else:
                _atomic_save(self._path(key), lambda p: np.save(p, row))
        _evict_lru(self.cache_dir, self.max_bytes)

    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses}


class TeacherBeamCache:
    """Disk cache for the teacher's beam-search KD targets (VERDICT r3 #1).

    The second KD-target path — beam-search teacher captions with
    beam-consensus logit extraction (reference model.py:762-793) — depends
    ONLY on the video (the beam never sees the ground-truth caption), so
    its outputs are even more cacheable than the forced logits: the key is
    the vid_id alone. One entry stores the beam ``predictions`` row
    ([max_steps] int32 — loss 5's teacher tokens) and, when
    ``store_consensus``, the per-word beam-consensus full-vocab logits
    ([S, V] f32, or the top-K (value, index) pair — same trade-off as
    :class:`TeacherLogitsCache`).

    Beam hyperparameters are part of the FILENAME (like top_k): replaying
    beams searched under a different beam_size/max_steps/length_penalty
    would silently change the KD distribution, so a config change MISSES
    and recomputes.
    """

    def __init__(self, cache_dir: str, max_bytes: Optional[int] = None,
                 top_k: int = 0, *, beam_size: int = 4, max_steps: int = 15,
                 length_penalty: float = 0.6, store_consensus: bool = True):
        self.cache_dir = cache_dir
        self.max_bytes = max_bytes
        self.top_k = int(top_k)
        self.beam_size = int(beam_size)
        self.max_steps = int(max_steps)
        self.length_penalty = float(length_penalty)
        self.store_consensus = bool(store_consensus)
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _path(self, key: str) -> str:
        lp = f"{self.length_penalty:g}".replace(".", "p").replace("-", "m")
        tag = (f".beam{self.beam_size}x{self.max_steps}lp{lp}"
               + (f".top{self.top_k}" if self.top_k else "")
               + ("" if self.store_consensus else ".toks"))
        return os.path.join(self.cache_dir, _sanitize(key) + tag + ".npz")

    @staticmethod
    def key(vid_id) -> str:
        return str(vid_id)

    def get_batch(self, keys: Sequence[str]) -> Optional[Dict[str, np.ndarray]]:
        """If EVERY key hits: dict with ``predictions`` [B, max_steps] and,
        when storing consensus targets, ``kd`` [B, S, V] f32 (or
        ``kd_vals``/``kd_idx`` [B, S, K] in top-k mode). Partial batches
        return None and recompute whole — one step signature, no gather."""
        preds: List[np.ndarray] = []
        kd: List[np.ndarray] = []
        kd_idx: List[np.ndarray] = []
        for key in keys:
            def _ld(p):
                with np.load(p) as z:
                    if not self.store_consensus:
                        return (z["predictions"],)
                    if self.top_k:
                        return z["predictions"], z["kd_vals"], z["kd_idx"]
                    return z["predictions"], z["kd"]
            entry = _load_or_none(self._path(key), _ld)
            if entry is None:
                self.misses += len(keys)
                return None
            preds.append(entry[0])
            if self.store_consensus:
                kd.append(entry[1])
                if self.top_k:
                    kd_idx.append(entry[2])
        self.hits += len(keys)
        for key in keys:  # touch for LRU recency
            try:
                os.utime(self._path(key), None)
            except OSError:
                pass
        out = {"predictions": np.stack(preds)}
        if self.store_consensus:
            if self.top_k:
                out["kd_vals"] = np.stack(kd)
                out["kd_idx"] = np.stack(kd_idx)
            else:
                out["kd"] = np.stack(kd)
        return out

    def compress(self, kd_logits: np.ndarray):
        """Dense [..., V] → (top-k values, indices); shared truncation for
        the miss and hit paths (see TeacherLogitsCache.compress)."""
        return _compress_topk(kd_logits, self.top_k)

    def put_batch(self, keys: Sequence[str], predictions,
                  kd_logits=None) -> None:
        predictions = np.asarray(predictions, dtype=np.int32)
        if self.store_consensus:
            if kd_logits is None:
                raise ValueError(
                    "store_consensus cache needs kd_logits in put_batch")
            kd_logits = np.asarray(kd_logits, dtype=np.float32)  # bf16→f32
        for i, key in enumerate(keys):
            if not self.store_consensus:
                arrays = {"predictions": predictions[i]}
            elif self.top_k:
                vals, idx = self.compress(kd_logits[i])
                arrays = {"predictions": predictions[i],
                          "kd_vals": vals, "kd_idx": idx}
            else:
                arrays = {"predictions": predictions[i], "kd": kd_logits[i]}
            _atomic_save(self._path(key),
                         lambda p, a=arrays: np.savez(p, **a))
        _evict_lru(self.cache_dir, self.max_bytes)

    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses}


def _evict_lru(cache_dir: str, max_bytes: Optional[int]) -> None:
    if max_bytes is None:
        return
    entries = []
    total = 0
    for fn in os.listdir(cache_dir):
        if ".tmp" in fn:  # _atomic_save in flight on another thread
            continue
        path = os.path.join(cache_dir, fn)
        try:
            st = os.stat(path)
        except OSError:
            continue
        entries.append((st.st_mtime, st.st_size, path))
        total += st.st_size
    entries.sort()  # oldest first
    for _, size, path in entries:
        if total <= max_bytes:
            break
        try:
            os.remove(path)
            total -= size
        except OSError:
            pass


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

    - ``_cache_keys``: per-row cache keys (when a forced-logit cache is
      attached);
    - on a full-vocab hit: ``teacher_logits`` (device, f32);
    - on a top-K hit: ``teacher_topk_vals`` / ``teacher_topk_idx`` (device)
      — the ~40 KB/sample pair; the dense tensor is rebuilt INSIDE the
      jitted train step (train.py), so it only ever exists in HBM.

    With a ``beam_cache`` (:class:`TeacherBeamCache`) attached, also:

    - ``_beam_cache_keys``: per-row vid-only keys (always present);
    - on a hit: ``teacher_beam_predictions`` (device int32) and — when the
      cache stores consensus targets — ``teacher_kd_logits`` (f32) or the
      ``teacher_kd_vals``/``teacher_kd_idx`` top-K pair.

    On a miss nothing is added; the consumer runs the live teacher (the
    device is busy with the current step anyway — epoch 1 is compute-bound,
    not IO-bound).
    """

    def __init__(self, loader, cache: Optional["TeacherLogitsCache"] = None,
                 mesh=None, depth: int = 2,
                 beam_cache: Optional["TeacherBeamCache"] = None):
        self.loader = loader
        self.cache = cache
        self.beam_cache = beam_cache
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
                    out = dict(batch)
                    if self.cache is not None:
                        if "vid-id" not in batch or "caption-id" not in batch:
                            raise ValueError(
                                "teacher_cache needs 'vid-id' and "
                                "'caption-id' in each batch")
                        keys = [self.cache.key(v, c) for v, c in
                                zip(batch["vid-id"], batch["caption-id"])]
                        out["_cache_keys"] = keys
                        cached = self.cache.get_batch(keys)
                        if cached is not None:
                            if self.cache.top_k:
                                vals, idx = cached
                                out["teacher_topk_vals"] = self._put(vals)
                                out["teacher_topk_idx"] = self._put(idx)
                            else:
                                out["teacher_logits"] = self._put(cached)
                    if self.beam_cache is not None:
                        if "vid-id" not in batch:
                            raise ValueError(
                                "teacher_beam_cache needs 'vid-id' in each "
                                "batch")
                        bkeys = [self.beam_cache.key(v)
                                 for v in batch["vid-id"]]
                        out["_beam_cache_keys"] = bkeys
                        bhit = self.beam_cache.get_batch(bkeys)
                        if bhit is not None:
                            out["teacher_beam_predictions"] = self._put(
                                bhit["predictions"])
                            if "kd_vals" in bhit:
                                out["teacher_kd_vals"] = self._put(
                                    bhit["kd_vals"])
                                out["teacher_kd_idx"] = self._put(
                                    bhit["kd_idx"])
                            elif "kd" in bhit:
                                out["teacher_kd_logits"] = self._put(
                                    bhit["kd"])
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
