"""Fused CLIP image preprocessing as a single jitted XLA stage.

Replaces the reference's per-frame torchvision pipeline (reference
src/utils/dataloader.py:14-32, duplicated at real_time_inference.py:12-28):
ToTensor → Resize(224, bicubic, shorter-edge) → CenterCrop(224) →
BGR→RGB channel flip → Normalize(CLIP mean/std).

TPU-first differences:

- one fused jitted function over the whole [N, H, W, 3] uint8 frame batch
  (device-side, bf16-friendly) instead of per-frame PIL/torch ops on host;
- NHWC layout (TPU-native for convs); the models accept NHWC directly;
- bicubic via ``jax.image.resize`` (cubic kernel, antialiased on
  downsampling) — matches PIL bicubic within ~1e-2 per channel, which is far
  below the normalization std, verified in tests/test_preprocess.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# CLIP normalization constants (reference dataloader.py:25-28).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("crop_size", "bgr_to_rgb"))
def clip_preprocess(frames: jnp.ndarray, crop_size: int = 224,
                    bgr_to_rgb: bool = True) -> jnp.ndarray:
    """uint8 [N, H, W, 3] (BGR, as cv2 decodes) → float32 [N, 224, 224, 3].

    Shorter edge resized to ``crop_size`` (bicubic), center crop, channel
    flip, scale to [0,1], CLIP-normalize. All shapes static under jit.
    """
    n, h, w, c = frames.shape
    x = frames.astype(jnp.float32) / 255.0

    # shorter-edge resize (torchvision Resize(int) semantics)
    if h <= w:
        new_h = crop_size
        new_w = max(int(round(w * crop_size / h)), crop_size)
    else:
        new_w = crop_size
        new_h = max(int(round(h * crop_size / w)), crop_size)
    x = jax.image.resize(x, (n, new_h, new_w, c), method="bicubic",
                         antialias=True)

    # center crop
    top = (new_h - crop_size) // 2
    left = (new_w - crop_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (n, crop_size, crop_size, c))

    if bgr_to_rgb:
        x = x[..., ::-1]

    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def preprocess_clip_batch(frames, crop_size: int = 224,
                          bgr_to_rgb: bool = True) -> jnp.ndarray:
    """Host-convenience wrapper: numpy uint8 [N,H,W,3] → device [N,224,224,3]."""
    x = jnp.asarray(frames)
    if x.ndim == 3:
        x = x[None]
    return clip_preprocess(x, crop_size=crop_size, bgr_to_rgb=bgr_to_rgb)
