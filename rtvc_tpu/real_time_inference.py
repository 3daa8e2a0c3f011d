"""Real-time streaming captioning (reference src/real_time_inference.py).

The reference's webcam loop was fully synchronous: capture, preprocessing
and a full greedy decode shared one thread, so the display froze during
every caption (SURVEY.md §3.3 — the #1 structural fix for this rebuild).

TPU-native architecture:

- **grabber thread**: reads the camera/video source continuously, keeps
  every 3rd frame (reference :44-54), pushes 6-frame windows into a depth-1
  "latest window" slot (old windows are dropped — the captioner always works
  on the freshest clip);
- **caption thread**: warm-compiled ``student_greedy`` step (jit + warmup at
  startup, so the first real frame never eats the compile); preprocessing is
  the fused XLA stage, overlapped with the next window's capture;
- **display/main loop**: never blocks on inference; overlays the latest
  caption (reference :64-70 semantics).

``run_realtime`` is headless-friendly (no cv2 GUI required): pass a video
file as ``source`` and ``display=False`` for benchmarking/CI; stats
(captions/s, p50 latency, effective fps) are returned.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

from . import decode as decode_lib
from .config import Config, cfg as default_cfg
from .models.student import StudentCandidateV1, student_from_config
from .ops.preprocess import clip_preprocess
from .utils.profiling import StepTimer

FRAME_KEEP_EVERY = 3   # reference real_time_inference.py:48
WINDOW = 6             # frames per caption (reference :56)
MAX_LEN = 25           # reference :58


def shrink_frame(frame: np.ndarray) -> np.ndarray:
    """Grabber-side shorter-edge-224 shrink (antialiased) + center crop
    before the host→device copy; the fused device stage finishes resize
    (identity at this size)/crop (no-op)/flip/normalize, so the result is
    pixel-identical to shipping the uncropped shrink (pinned by
    tests/test_entrypoints.py). Cuts the per-window transfer ~7x vs raw
    480p (the crop alone is −25%: 1.2 MB → 0.9 MB per 6-frame window)."""
    import cv2

    h, w = frame.shape[:2]
    if min(h, w) > 224:
        scale = 224 / min(h, w)
        size = (int(round(w * scale)), int(round(h * scale)))
        frame = cv2.resize(frame, size, interpolation=cv2.INTER_AREA)
    h, w = frame.shape[:2]
    if min(h, w) == 224:
        # crop commutes with the device stage only when the shorter edge
        # is already 224 (its resize is then the identity); smaller frames
        # ship whole so the device's bicubic upscale sees the full field
        # of view
        top, left = (h - 224) // 2, (w - 224) // 2
        frame = frame[top:top + 224, left:left + 224]
    return frame


class LatestSlot:
    """Depth-1 handoff: the captioner always gets the newest window."""

    def __init__(self):
        self._cond = threading.Condition()
        self._item = None
        self._closed = False

    def put(self, item) -> None:
        with self._cond:
            self._item = item
            self._cond.notify()

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()

    def get(self, timeout: float = 1.0):
        with self._cond:
            while self._item is None and not self._closed:
                self._cond.wait(timeout)
                if self._item is None and not self._closed:
                    return None
            if self._item is None:
                return None
            item, self._item = self._item, None
            return item


class StreamingCaptioner:
    """Pre-compiled captioning step over 6-frame uint8 windows."""

    def __init__(self, student: StudentCandidateV1, variables, tokenizer,
                 max_len: int = MAX_LEN,
                 frame_shape: Optional[tuple] = None):
        import jax

        self.student = student
        self.variables = variables
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.timer = StepTimer("caption")

        def step(variables, frames_u8):
            # variables is a jit ARGUMENT: closing over the param tree
            # would inline ~254 MB of constants into the program, bloating
            # the (remote) compile payload for zero runtime benefit.
            proc = clip_preprocess(frames_u8)          # [W, 224, 224, 3]
            return decode_lib.student_greedy(
                student, variables, proc[None], max_len=max_len)

        self._jit_step = jax.jit(step)
        self._step = lambda f: self._jit_step(self.variables, f)
        if frame_shape is not None:
            self.warmup(frame_shape)

    def warmup(self, frame_shape: tuple) -> None:
        import jax.numpy as jnp
        dummy = jnp.zeros((WINDOW,) + tuple(frame_shape), jnp.uint8)
        np.asarray(self._step(dummy))  # compile + execute once

    def caption(self, window: np.ndarray) -> str:
        import jax.numpy as jnp
        self.timer.start()
        tokens = self._step(jnp.asarray(window))
        tokens = np.asarray(tokens)  # sync
        self.timer.stop()
        return self.tokenizer.decode(tokens[0], skip_special_tokens=True)


def run_realtime(config: Config = default_cfg, source: Any = 0,
                 student: Optional[StudentCandidateV1] = None,
                 variables=None, tokenizer=None, display: bool = True,
                 max_captions: Optional[int] = None,
                 max_seconds: Optional[float] = None) -> Dict[str, float]:
    """Camera/video streaming loop. Returns timing stats."""
    import cv2
    import jax

    student = student or student_from_config(config)
    if tokenizer is None:
        from .tokenization import BertWordPieceTokenizer
        tokenizer = BertWordPieceTokenizer()
    if variables is None:
        rng = jax.random.PRNGKey(config.seed)
        import jax.numpy as jnp
        dummy_f = jnp.zeros((1, WINDOW, 224, 224, 3))
        dummy_y = jnp.array([[student.cls_token_id, 5]], jnp.int32)
        variables = jax.jit(student.init)(rng, dummy_f, dummy_y)

    cap = cv2.VideoCapture(source)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video source {source!r}")
    ret, probe = cap.read()
    if not ret:
        raise RuntimeError("video source yielded no frames")

    probe = shrink_frame(probe)
    captioner = StreamingCaptioner(student, variables, tokenizer,
                                   frame_shape=probe.shape)

    slot = LatestSlot()
    stop = threading.Event()
    captions: List[str] = []
    latest_caption = [""]
    frames_seen = [1]

    def captioner_thread():
        while not stop.is_set():
            window = slot.get(timeout=0.25)
            if window is None:
                continue
            text = captioner.caption(window)
            latest_caption[0] = text
            captions.append(text)
            if max_captions and len(captions) >= max_captions:
                stop.set()

    worker = threading.Thread(target=captioner_thread, daemon=True)
    worker.start()

    window: List[np.ndarray] = [probe]  # probe counts as a kept frame
    counter = 0
    t_start = time.perf_counter()
    try:
        while not stop.is_set():
            ret, frame = cap.read()
            if not ret:
                break
            frames_seen[0] += 1
            counter += 1
            if counter == FRAME_KEEP_EVERY:   # keep every 3rd frame (:48)
                window.append(shrink_frame(frame))
                counter = 0
            if len(window) == WINDOW:         # caption per window (:56)
                slot.put(np.stack(window))
                window.clear()
            if display:
                font = cv2.FONT_HERSHEY_SIMPLEX
                text = latest_caption[0]
                size = cv2.getTextSize(text, font, 2, 6)[0]
                pos = ((frame.shape[1] - size[0]) // 2, frame.shape[0] - 40)
                cv2.putText(frame, text, pos, font, 2, (0, 0, 255), 6)
                cv2.imshow("Webcam Live with Caption", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            if max_seconds and time.perf_counter() - t_start > max_seconds:
                break
    finally:
        stop.set()
        slot.close()
        worker.join(timeout=5)
        cap.release()
        if display:
            cv2.destroyAllWindows()

    elapsed = time.perf_counter() - t_start
    stats = {
        "captions": float(len(captions)),
        "elapsed_s": elapsed,
        "captions_per_s": len(captions) / max(elapsed, 1e-9),
        "source_fps": frames_seen[0] / max(elapsed, 1e-9),
    }
    if captioner.timer.durations:
        stats.update(captioner.timer.summary())
    return stats


if __name__ == "__main__":
    import sys
    args = [a for a in sys.argv[1:] if a != "--headless"]
    headless = "--headless" in sys.argv[1:]
    src: Any = 0 if not args else args[0]
    if isinstance(src, str) and src.isdigit():
        src = int(src)
    print(run_realtime(source=src, display=not headless))
