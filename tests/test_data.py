"""Data-layer tests: video handlers, samplers, dataset, device loader."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rtvc_tpu.data import frame_sampling, video_handlers
from rtvc_tpu.data.dataset import CaptionDataset, DeviceLoader, collate_batch


def _write_video(path, num_frames=30, size=(64, 48), fps=10):
    """Synthetic mp4 (falls back to skip if no codec)."""
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, fps, size)
    if not w.isOpened():
        pytest.skip("no mp4 codec available")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
    for i in range(num_frames):
        frame = np.clip(base.astype(np.int32) + i * 5, 0, 255).astype(np.uint8)
        w.write(frame)
    w.release()
    return str(path)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    return _write_video(tmp_path_factory.mktemp("vids") / "video0.mp4")


def test_get_video_frames(video):
    frames = video_handlers.get_video_frames(video)
    assert frames.shape == (30, 48, 64, 3)


def test_evenly_sampled(video):
    frames = video_handlers.get_evenly_sampled_frames(video, 6)
    assert frames.shape[0] == 6
    frames2 = video_handlers.get_evenly_sampled_frames2(video, 6)
    assert frames2.shape[0] == 6
    np.testing.assert_array_equal(frames, frames2)


def test_resize_and_downsample(video):
    fr = video_handlers.get_video_frames_with_resize(video, 0.5, 0.5)
    assert fr.shape[1:3] == (24, 32)
    fg = video_handlers.get_video_frames_with_rgb_to_gray(video)
    assert fg.ndim == 3
    fd = video_handlers.get_video_frames_with_downsample(video, 3)
    assert fd.shape[0] == 10


def test_enhancements(video):
    frames = video_handlers.get_video_frames(video)[:3]
    for method in ("sharpen", "hist_eq", "unsharp", "contrast"):
        out = video_handlers.enhance_frame_features(frames, method)
        assert out.shape == frames.shape
        assert out.dtype == np.uint8


def test_samplers(video):
    u = frame_sampling.uniform_sampling(video, 0.5)
    assert 10 <= u.shape[0] <= 16
    b = frame_sampling.random_sampling_from_bins(video, 5)
    assert b.shape[0] == 5
    c = frame_sampling.clustered_sampling(video, 3)
    assert 1 <= c.shape[0] <= 30
    m = frame_sampling.frame_mse_difference_sampling(video, 10.0)
    assert m.shape[0] >= 1
    s = frame_sampling.scene_change_detection_sampling(video, 0.05)
    assert s.shape[0] >= 1


def test_sampler_determinism(video):
    a = frame_sampling.random_sampling_from_bins(video, 5)
    b = frame_sampling.random_sampling_from_bins(video, 5)
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, video):
    import pandas as pd
    root = tmp_path_factory.mktemp("data")
    # one mp4 + one npy clip
    import shutil
    shutil.copy(video, root / "vidA.mp4")
    rng = np.random.default_rng(1)
    np.save(root / "vidB.npy",
            rng.integers(0, 255, size=(24, 48, 64, 3), dtype=np.uint8))
    df = pd.DataFrame({
        "image_id": ["vidA", "vidA", "vidB"],
        "id": [10, 11, 20],
        "caption": ["a", "b", "c"],
    })
    encoded = {10: [101, 5, 6], 11: [101, 7], 20: [101, 8, 9, 4]}
    return CaptionDataset(str(root), ["vidA", "vidB"], df, encoded,
                          num_frames=6, random_state=5)


def test_dataset_items(dataset):
    item = dataset[0]
    assert item["frames"].shape == (6, 48, 64, 3)
    assert item["caption"][0] == 101
    assert item["vid-id"] == "vidA"
    item2 = dataset[1]  # npy-backed
    assert item2["frames"].shape == (6, 48, 64, 3)
    # seeded caption choice is deterministic
    assert dataset[0]["caption-id"] == dataset[0]["caption-id"]


def test_collate_static_bucket(dataset):
    batch = collate_batch([dataset[0], dataset[1]], max_text_len=12)
    assert batch["frames"].shape == (2, 6, 48, 64, 3)
    assert batch["caption"].shape == (2, 12)
    assert batch["caption"][0, 0] == 101
    assert batch["caption"][0, -1] == 0  # right-padded


def test_device_loader_preprocess(dataset):
    loader = DeviceLoader(dataset, batch_size=2, max_text_len=12,
                          drop_last=False)
    batches = list(loader)
    assert len(batches) == 1
    frames = np.asarray(batches[0]["frames"])
    assert frames.shape == (2, 6, 224, 224, 3)
    assert frames.dtype == np.float32
    assert batches[0]["caption"].shape == (2, 12)


def test_device_loader_shuffles_across_epochs(dataset):
    loader = DeviceLoader(dataset, batch_size=1, shuffle=True, seed=0,
                          preprocess=False, drop_last=False)
    first = [b["vid-id"][0] for b in loader]
    orders = {tuple(first)}
    for _ in range(4):
        orders.add(tuple(b["vid-id"][0] for b in loader))
    assert len(orders) > 1  # epoch seed advances


def test_device_loader_process_pool_matches_inline(dataset):
    """num_workers > 0 fans clip decode across a spawn pool; batches must be
    identical to the single-thread path (caption sampling stays in the
    parent, so worker count cannot change the data)."""
    kw = dict(batch_size=2, max_text_len=12, preprocess=False,
              drop_last=False)
    inline = list(DeviceLoader(dataset, **kw))
    pooled_loader = DeviceLoader(dataset, num_workers=2, **kw)
    pooled = list(pooled_loader)
    assert len(inline) == len(pooled) == 1
    np.testing.assert_array_equal(np.asarray(inline[0]["frames"]),
                                  np.asarray(pooled[0]["frames"]))
    np.testing.assert_array_equal(np.asarray(inline[0]["caption"]),
                                  np.asarray(pooled[0]["caption"]))
    assert inline[0]["vid-id"] == pooled[0]["vid-id"]
    pooled_loader._pool.shutdown()


def test_device_loader_close_shuts_down_pool(dataset_fixture=None):
    """close() (and context-manager exit) shuts the decode pool down so
    idle spawn workers don't accumulate across loaders."""
    import pandas as pd
    from rtvc_tpu.data.dataset import CaptionDataset, DeviceLoader

    df = pd.DataFrame({"image_id": ["v0"], "id": [0]})
    ds = CaptionDataset(".", ["v0"], df, {0: [101, 7]}, num_frames=2)
    loader = DeviceLoader(ds, 1, num_workers=1)
    pool = loader._decode_pool()
    assert loader._pool is pool
    loader.close()
    assert loader._pool is None
    with pytest.raises(RuntimeError):
        pool.submit(int, 1)  # shutdown pool rejects new work
    with DeviceLoader(ds, 1, num_workers=1) as dl:
        dl._decode_pool()
    assert dl._pool is None
