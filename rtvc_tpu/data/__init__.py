from .video_handlers import (
    get_video_frames,
    get_evenly_sampled_frames,
    get_evenly_sampled_frames2,
)
from .frame_sampling import SAMPLERS
from .dataset import CaptionDataset, collate_batch, DeviceLoader

__all__ = [
    "get_video_frames",
    "get_evenly_sampled_frames",
    "get_evenly_sampled_frames2",
    "SAMPLERS",
    "CaptionDataset",
    "collate_batch",
    "DeviceLoader",
]
