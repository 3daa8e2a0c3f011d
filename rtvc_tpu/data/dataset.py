"""Caption dataset + device-feeding pipeline.

Rebuilds the reference's data layer (reference src/utils/dataloader.py:35-114
+ torch DataLoader usage at train.py:76-112) the TPU way:

- ``CaptionDataset``: same item semantics as the reference — pick ONE random
  caption per video (seeded via ``random_state``, dataloader.py:66), look up
  its pre-encoded token ids, decode ``num_frames`` evenly-sampled frames,
  apply the redundant second stride subsample (dataloader.py:78, preserved),
  and return raw uint8 BGR frames. Pixel preprocessing is NOT per-frame
  host work here — the loader batches frames and runs the fused XLA
  preprocessing stage once per batch (ops/preprocess.py).
- ``collate_batch``: pads captions to a STATIC bucket length (default 40 =
  the tokenizer's max_text_len) instead of the batch max — fixed shapes mean
  one XLA compilation, no recompiles per batch (the reference's
  pad-to-batch-max, dataloader.py:100-113, would retrace under jit).
- ``DeviceLoader``: background-thread prefetcher that overlaps host decode
  with device compute and places batches sharded over the ``dp`` mesh axis
  (replaces torch DataLoader worker processes + pin_memory H2D copies).

Also supports ``.npy`` clips ([N, H, W, 3] uint8) alongside ``.mp4`` so tests
and benchmarks run without video codecs.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .video_handlers import get_evenly_sampled_frames


def load_clip_frames(data_path: str, vid_id: str,
                     num_frames: int) -> np.ndarray:
    """Decode one clip's evenly-sampled frames (module-level so a process
    pool can run it; touches only cv2/numpy — safe in worker processes)."""
    mp4 = os.path.join(data_path, vid_id + ".mp4")
    npy = os.path.join(data_path, vid_id + ".npy")
    if os.path.exists(mp4):
        raw = get_evenly_sampled_frames(mp4, num_frames)
    elif os.path.exists(npy):
        clip = np.load(npy)
        stride = max(len(clip) // num_frames, 1)
        raw = clip[np.arange(0, len(clip), stride)[:num_frames]]
    else:
        raise FileNotFoundError(f"no clip for {vid_id} in {data_path}")
    # redundant second stride subsample, preserved (dataloader.py:78)
    n = raw.shape[0]
    idx = np.arange(0, n, max(n // num_frames, 1))[:num_frames]
    return raw[idx]


class CaptionDataset:
    """Video → (frames, encoded caption) items (dataloader.py:35-82)."""

    def __init__(self, data_path: str, vid_ids: Sequence[str], data,
                 encoded_caption_data: Dict[Any, Sequence[int]],
                 num_frames: int = 6,
                 random_state: Optional[int] = None):
        self.data_path = data_path
        self.vid_ids = list(vid_ids)
        self.data = data  # pandas DataFrame with columns [image_id, id, ...]
        self.num_frames = num_frames
        self.random_state = random_state
        self.encoded_caption_data = encoded_caption_data

    def __len__(self) -> int:
        return len(self.vid_ids)

    def _load_frames(self, vid_id: str) -> np.ndarray:
        return load_clip_frames(self.data_path, vid_id, self.num_frames)

    def item_meta(self, idx: int) -> Dict[str, Any]:
        """Caption lookup only (no frame decode) — the process-pool path
        keeps the seeded pandas sampling in the parent so worker count
        never changes which caption pairs with which video."""
        vid_id = self.vid_ids[idx]
        caption_ids = self.data.loc[self.data["image_id"] == vid_id, "id"]
        caption_id = caption_ids.sample(
            n=1, random_state=self.random_state).iloc[0]
        encoded = np.asarray(self.encoded_caption_data[caption_id], np.int32)
        return {"caption": encoded, "caption-id": caption_id,
                "vid-id": vid_id}

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        vid_id = self.vid_ids[idx]
        caption_ids = self.data.loc[self.data["image_id"] == vid_id, "id"]
        caption_id = caption_ids.sample(
            n=1, random_state=self.random_state).iloc[0]
        encoded = np.asarray(self.encoded_caption_data[caption_id], np.int32)
        frames = self._load_frames(vid_id)
        return {"frames": frames, "caption": encoded,
                "caption-id": caption_id, "vid-id": vid_id}


def collate_batch(items: List[Dict[str, Any]],
                  max_text_len: int = 40) -> Dict[str, Any]:
    """Static-shape collate: frames stacked [B, F, H, W, 3] uint8, captions
    right-padded with 0 to the FIXED bucket (not batch max — see module
    docstring). Caption ids / vid ids pass through as lists."""
    frames = np.stack([it["frames"] for it in items])
    caps = np.zeros((len(items), max_text_len), np.int32)
    for i, it in enumerate(items):
        ids = np.asarray(it["caption"], np.int32)[:max_text_len]
        caps[i, :len(ids)] = ids
    return {
        "frames": frames,
        "caption": caps,
        "caption-id": [it["caption-id"] for it in items],
        "vid-id": [it["vid-id"] for it in items],
    }


class DeviceLoader:
    """Double-buffered host→device batch feeder.

    A background thread assembles host batches (video decode + collate);
    the consumer side preprocesses them with the fused XLA stage and places
    them on the mesh (sharded over ``dp``) while the previous batch computes
    — replacing the reference's torch DataLoader workers (train.py:76-112)
    and the real-time script's synchronous stalls (SURVEY.md §3.3).
    """

    def __init__(self, dataset: CaptionDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 max_text_len: int = 40, mesh=None,
                 preprocess: bool = True, prefetch_depth: int = 2,
                 drop_last: bool = False, num_workers: int = 0,
                 host_slice: Optional[tuple] = None):
        # drop_last defaults False like torch DataLoader (the reference's
        # loaders kept tail batches); pass True for jit-hot training loops
        # to avoid a recompile on the ragged final batch.
        # num_workers > 0 decodes a batch's clips in a process pool
        # (ROADMAP #9) — cv2 releases the GIL, but a single producer thread
        # still serializes per-clip decode on real mp4s; workers fan the
        # decode across cores. Caption sampling stays in the parent
        # (item_meta), so worker count never changes the data.
        # host_slice=(start, stop): multi-host mode — batch_size is the
        # GLOBAL batch; every host walks the same seeded global order but
        # decodes/yields only rows [start:stop) of each global batch window
        # (parallel/multihost.py host_batch_slice). Requires drop_last so
        # every window is full.
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.max_text_len = max_text_len
        self.mesh = mesh
        self.preprocess = preprocess
        self.prefetch_depth = prefetch_depth
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.host_slice = host_slice
        if host_slice is not None and not drop_last:
            raise ValueError("host_slice (multi-host) requires drop_last: "
                             "every global batch window must be full so all "
                             "hosts agree on the step count")
        self._pool = None
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch index the NEXT ``__iter__`` shuffles with (torch
        ``DistributedSampler.set_epoch`` convention). ``train(...,
        resume_schedule=True)`` uses this so a resumed run's epoch-E
        shuffle order is the one the uninterrupted run would have used;
        without a call the counter just auto-increments per iteration."""
        self._epoch = int(epoch)

    def _decode_pool(self):
        if self._pool is None:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            # spawn (not fork): the parent holds jax/TPU-client state that
            # must not leak into decode workers; children import only
            # cv2/numpy via load_clip_frames
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"))
        return self._pool

    def close(self) -> None:
        """Shut down the decode process pool (idle spawn workers otherwise
        outlive the loader — training builds several loaders per run)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __enter__(self) -> "DeviceLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _host_batches(self, epoch: int) -> Iterator[Dict[str, Any]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            if self.host_slice is not None:
                idxs = idxs[self.host_slice[0]:self.host_slice[1]]
            if self.num_workers > 0:
                metas = [self.dataset.item_meta(int(i)) for i in idxs]
                futures = [self._decode_pool().submit(
                    load_clip_frames, self.dataset.data_path,
                    self.dataset.vid_ids[int(i)], self.dataset.num_frames)
                    for i in idxs]
                items = [meta | {"frames": fut.result()}
                         for meta, fut in zip(metas, futures)]
            else:
                items = [self.dataset[int(i)] for i in idxs]
            yield collate_batch(items, self.max_text_len)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import jax

        from ..ops.preprocess import clip_preprocess

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        sentinel = object()
        errbox: List[BaseException] = []

        # Epoch is captured BEFORE the producer starts: the producer thread
        # reads it for the shuffle seed, and incrementing the shared counter
        # after thread.start() raced with that read (the shuffle order of an
        # epoch was nondeterministic — caught by the multi-host host_slice
        # test, where three loaders must agree on one global order).
        epoch = self._epoch
        self._epoch += 1

        def producer():
            try:
                for batch in self._host_batches(epoch):
                    q.put(batch)
            except BaseException as e:  # surfaced on the consumer side
                errbox.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        while True:
            batch = q.get()
            if batch is sentinel:
                if errbox:
                    raise errbox[0]
                return
            out = dict(batch)
            frames = batch["frames"]
            if self.preprocess:
                b, f = frames.shape[:2]
                flat = jax.numpy.asarray(frames.reshape((-1,) + frames.shape[2:]))
                proc = clip_preprocess(flat)
                out["frames"] = proc.reshape((b, f) + proc.shape[1:])
            else:
                out["frames"] = jax.numpy.asarray(frames)
            out["caption"] = jax.numpy.asarray(batch["caption"])
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch
                arrays = {"frames": out["frames"], "caption": out["caption"]}
                arrays = shard_batch(arrays, self.mesh)
                out.update(arrays)
            yield out


def load_labels(captions_path: str, encoded_path: str):
    """Load the labels CSV + encoded-captions pickle the reference training
    entry consumed (reference train.py:170-172)."""
    import pandas as pd
    data = pd.read_csv(captions_path)
    with open(encoded_path, "rb") as f:
        encoded = pickle.load(f)
    return data, encoded
