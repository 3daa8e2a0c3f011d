"""Multi-stream batched captioning service (serving hardening).

The reference's real-time entry serves exactly ONE camera stream with a
synchronous capture→decode loop (reference src/real_time_inference.py:30-75);
``real_time_inference.py`` here rebuilds that loop threaded, and this module
is the production layer above it: N independent streams (cameras, uploaded
clips, RTC sessions) share ONE chip by batching their 6-frame windows into a
single jitted preprocess+greedy-decode program. The batch-8 decode path runs
at ~192 clips/s on a v5e chip vs ~16 windows/s for serial batch-1 dispatch
(docs/PERF.md §5) — cross-stream batching is worth ~12x in chip utilization.

Architecture (TPU-first):

- ``submit(window, stream_id=...)`` enqueues a request and returns a
  ``CaptionFuture``. Per-stream **latest-window semantics**: a new window
  from the same stream replaces its not-yet-scheduled predecessor (the
  superseded future resolves with ``superseded=True``) — live cameras always
  want the freshest caption, never a backlog (same drop policy as
  ``real_time_inference.LatestSlot``, per stream).
- A scheduler thread forms batches: it waits up to ``max_wait_ms`` after the
  first pending request for more streams to arrive, then takes up to
  ``max_batch`` requests FIFO.
- The batch is padded to the next **bucket size** (default 1,2,4,...,
  max_batch) so only ``len(buckets)`` programs are ever compiled — XLA
  needs static shapes, and per-request-count recompiles would stall the
  service. Pad rows are zero windows whose outputs are discarded.
- Exactness under batching: greedy rows are independent (self-attention
  never crosses the batch axis), and the all-rows-SEP early stop can only
  run LONGER with extra rows — a row's tokens up to its first SEP are
  bit-identical at any batch size. Each row is therefore truncated at its
  first SEP before text decode, which reproduces the single-request result
  exactly (at B=1 the early stop leaves 0-padding after SEP); pinned by
  tests/test_serving.py.

CLI demo (simulates N streams replaying one clip):

    python -m rtvc_tpu.serving clip.mp4 --streams 8 --windows 32
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict, deque
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import decode as decode_lib
from .models.student import StudentCandidateV1

SEP_TOKEN_ID = 102  # BERT [SEP] (reference model.py:184 stop token)
STATS_WINDOW = 4096  # recent samples kept for latency/batch percentiles


class CaptionFuture:
    """Result handle for one submitted window."""

    def __init__(self) -> None:
        self._event = threading.Event()
        self._resolve_lock = threading.Lock()
        self._text: Optional[str] = None
        self._tokens: Optional[np.ndarray] = None
        self._error: Optional[BaseException] = None
        self.superseded = False
        self.submit_time = time.perf_counter()
        self.done_time: Optional[float] = None

    def _resolve(self, text: Optional[str], tokens: Optional[np.ndarray],
                 *, superseded: bool = False,
                 error: Optional[BaseException] = None) -> None:
        # First resolution wins; later attempts are no-ops. This makes the
        # close()-vs-live-scheduler race benign: if close() errors a future
        # out after its join timed out, a still-running scheduler pass can
        # no longer mutate the result a client already observed.
        with self._resolve_lock:
            if self._event.is_set():
                return
            self._text = text
            self._tokens = tokens
            self.superseded = superseded
            self._error = error
            self.done_time = time.perf_counter()
            self._event.set()

    def done(self) -> bool:
        return self._event.is_set()

    def result(self, timeout: Optional[float] = None) -> Optional[str]:
        """Caption text; ``None`` if superseded by a newer same-stream
        window. Raises on server-side errors / timeout."""
        if not self._event.wait(timeout):
            raise TimeoutError("caption not ready")
        if self._error is not None:
            raise self._error
        return self._text

    def tokens(self, timeout: Optional[float] = None) -> Optional[np.ndarray]:
        if not self._event.wait(timeout):
            raise TimeoutError("caption not ready")
        if self._error is not None:
            raise self._error
        return self._tokens

    @property
    def latency_s(self) -> Optional[float]:
        if self.done_time is None:
            return None
        return self.done_time - self.submit_time


class _Request:
    __slots__ = ("window", "future", "stream_id")

    def __init__(self, window: np.ndarray, stream_id: Optional[str]):
        self.window = window
        self.future = CaptionFuture()
        self.stream_id = stream_id


def compress_window(window: np.ndarray, *, fmt: str = ".jpg",
                    quality: int = 90) -> List[bytes]:
    """[window, H, W, 3] uint8 -> one JPEG/PNG blob per frame (client side).

    A raw 6x224x224x3 window is ~0.9 MB on the wire (the measured transport
    cost of the HTTP/gRPC fronts, docs/PERF.md §5a); JPEG at quality 90 is
    typically 10-30x smaller and real cameras emit JPEG (MJPEG) natively.
    ``fmt=".png"`` is lossless — compressed and raw submissions then yield
    bit-identical captions (pinned by tests). Decode side:
    ``decode_compressed_frames``.
    """
    import cv2
    window = np.ascontiguousarray(window, np.uint8)
    if window.ndim != 4 or window.shape[-1] != 3:
        raise ValueError(f"expected [window, H, W, 3], got {window.shape}")
    params = ([int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
              if fmt in (".jpg", ".jpeg") else [])
    blobs = []
    for frame in window:
        ok, buf = cv2.imencode(fmt, frame, params)
        if not ok:
            raise ValueError(f"cv2.imencode({fmt!r}) failed")
        blobs.append(buf.tobytes())
    return blobs


def decode_compressed_frames(
        blobs: Sequence[bytes],
        expect_shape: Optional[Tuple[int, ...]] = None) -> np.ndarray:
    """JPEG/PNG per-frame blobs -> [window, H, W, 3] uint8 (server side).

    Channel order is whatever cv2.imdecode produces (BGR) — identical to
    the cv2.VideoCapture frames the raw path carries, so the downstream
    preprocess (reference dataloader.py:14-32's BGR->RGB flip) sees the
    same convention either way.

    ``expect_shape`` — the server's ``(window, H, W, 3)`` — makes this
    decompression-bomb safe: a tiny constant-color PNG can decode at a
    >1000:1 ratio, so a body well under the transport caps could
    otherwise materialize tens of GB. With the expected shape known we
    reject a wrong blob count before decoding anything and a wrong frame
    shape after decoding ONE frame, never the whole window.
    """
    import cv2
    if not blobs:
        raise ValueError("no frames in compressed window")
    expect_frame = None
    if expect_shape is not None:
        if len(blobs) != expect_shape[0]:
            raise ValueError(
                f"{len(blobs)} encoded frames but server window is "
                f"{expect_shape[0]}")
        expect_frame = tuple(expect_shape[1:])
    frames = []
    for i, blob in enumerate(blobs):
        if not blob:
            # cv2.imdecode asserts (cv2.error, NOT ValueError) on an empty
            # buffer — both network fronts map ValueError to a 400/
            # INVALID_ARGUMENT, so an empty blob must raise ValueError here
            # or a hostile request turns into a 500 (found by proto fuzz)
            raise ValueError(f"frame {i}: zero-length encoded frame")
        try:
            img = cv2.imdecode(np.frombuffer(blob, np.uint8),
                               cv2.IMREAD_COLOR)
        except cv2.error as e:
            raise ValueError(f"frame {i}: not a decodable JPEG/PNG image "
                             f"({e})")
        if img is None:
            raise ValueError(f"frame {i}: not a decodable JPEG/PNG image")
        if expect_frame is not None and img.shape != expect_frame:
            raise ValueError(
                f"frame {i} decodes to {img.shape}, server expects "
                f"{expect_frame}")
        frames.append(img)
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(
            f"frames in one window disagree on shape: {sorted(shapes)}")
    return np.stack(frames)


def truncate_at_sep(row: np.ndarray, sep_id: int = SEP_TOKEN_ID) -> np.ndarray:
    """Tokens up to (excluding) the first SEP — the part of a greedy row
    that is invariant to batch composition (see module docstring)."""
    hits = np.nonzero(row == sep_id)[0]
    return row[: hits[0]] if hits.size else row


def with_vocab_w8(variables):
    """Augment a student variables tree with the one-time weight-only int8
    pack of its vocab projection (collection ``vocab_w8``) for the
    ``vocab_int8`` serving knob. Quantization happens HERE, once per weight
    set — not inside the per-window step."""
    from .ops.quantization import quantize_vocab_head
    return dict(variables, vocab_w8=quantize_vocab_head(variables))


def make_caption_step(student: StudentCandidateV1, *, max_len: int = 25,
                      beam: int = 0, crop_size: int = 224,
                      vocab_int8: bool = False):
    """The serving program: uint8 window batch → caption token rows.

    ``step(variables, frames_u8)`` maps ``[B, W, H, Wd, 3]`` uint8 frames
    through the fused CLIP preprocess and a fixed-shape greedy (or
    ``beam``-wide) decode to ``[B, 1+max_len]`` int32 token rows. This is
    the single program behind every serving surface — the
    ``BatchCaptionServer`` buckets jit it per batch size, and
    ``rtvc_tpu.export`` lowers the same function into AOT deployment
    artifacts, so an exported program is the served program by
    construction. Params stay a jit ARGUMENT (constant-inlining a ~254 MB
    tree bloats the compile payload, docs/PERF.md §4). ``crop_size``
    parameterizes the preprocess target resolution (default 224 = CLIP;
    the multichip dryrun drives this same program at tiny shapes).

    ``vocab_int8=True`` routes the decode loop's vocab projection through
    the weight-only int8 Pallas GEMV (ops/int8_gemm.w8_matmul). The
    caller must pass variables through :func:`with_vocab_w8` first — the
    pack is computed once per weight set, not per window. Opt-in and
    measured a WASH at this model's shapes (0.97x composed caption step:
    XLA hides the vocab read under layer compute — w8_matmul docstring);
    it exists for wider-vocab/longer-decode variants. Logits move by
    ~bf16-rounding scale, so batched==solo exactness vs the DEFAULT
    program no longer holds token-for-token.
    """
    def step(variables, frames_u8):
        from .ops.preprocess import clip_preprocess
        vw = None
        if vocab_int8:
            if "vocab_w8" not in variables:
                raise ValueError(
                    "vocab_int8 serving needs variables from with_vocab_w8()")
            vw = variables["vocab_w8"]
            variables = {k: v for k, v in variables.items()
                        if k != "vocab_w8"}
        b, w = frames_u8.shape[:2]
        flat = frames_u8.reshape((b * w,) + frames_u8.shape[2:])
        proc = clip_preprocess(flat, crop_size=crop_size)
        proc = proc.reshape((b, w) + proc.shape[1:])
        if beam > 0:
            return decode_lib.student_beam(
                student, variables, proc, max_len=max_len, k=beam,
                vocab_w8=vw)
        return decode_lib.student_greedy(
            student, variables, proc, max_len=max_len, vocab_w8=vw)

    return step


def default_buckets(max_batch: int) -> Tuple[int, ...]:
    out = [1]
    while out[-1] < max_batch:
        out.append(min(out[-1] * 2, max_batch))
    return tuple(out)


class BatchCaptionServer:
    """Batches caption requests from many streams into one decode program.

    Parameters
    ----------
    student, variables, tokenizer:
        same trio ``real_time_inference.StreamingCaptioner`` takes.
    max_batch:
        largest batch one program processes (compile-time bound).
    max_wait_ms:
        scheduler linger after the first pending request — the
        latency/throughput knob. 0 = dispatch immediately (lowest latency);
        a few ms lets concurrent streams coalesce into full batches.
    beam:
        0 decodes greedily (reference real-time behavior); K>0 runs the
        fixed-shape batch beam search (decode.student_beam, reference
        model.py:189-317) inside the same bucket-compiled programs.
    buckets:
        compiled batch sizes; requests are padded up to the next bucket.
    frame_shape:
        (H, W, 3) of incoming uint8 frames; all streams must agree (resize
        on the client/grabber side — ``real_time_inference.shrink_frame``).
    mesh:
        optional ``jax.sharding.Mesh`` with a ``dp`` axis: params are
        replicated once, every batch is sharded over ``dp``, and each
        bucket-compiled program runs data-parallel across the mesh's
        chips (rows are independent, so N chips serve ~N× the streams at
        the same per-window latency). Buckets are rounded up to multiples
        of dp so every shard gets equal rows.
    """

    def __init__(self, student: StudentCandidateV1, variables: Any,
                 tokenizer: Any, *, max_batch: int = 8,
                 max_wait_ms: float = 4.0, max_len: int = 25,
                 beam: int = 0,
                 buckets: Optional[Sequence[int]] = None,
                 frame_shape: Tuple[int, int, int] = (224, 224, 3),
                 window: int = 6, warmup: bool = True, mesh: Any = None,
                 vocab_int8: bool = False):
        import jax

        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.student = student
        self.tokenizer = tokenizer
        self.vocab_int8 = bool(vocab_int8)
        if self.vocab_int8:
            # one-time weight-only int8 pack of the vocab head, carried in
            # the variables tree so every bucket program (and dp replica)
            # shares it (docs/PERF.md §5 round-5 addendum)
            variables = with_vocab_w8(variables)
        self.mesh = mesh
        self._dp = int(mesh.shape.get("dp", 1)) if mesh is not None else 1
        if self._dp > 1:
            from .parallel.mesh import replicate
            # round max_batch up so the largest bucket splits evenly
            max_batch = -(-int(max_batch) // self._dp) * self._dp
            variables = replicate(variables, mesh)
        self.variables = variables
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_len = int(max_len)
        self.beam = int(beam)  # 0 = greedy; K>0 = fixed-shape beam search
        self.buckets = tuple(sorted(buckets)) if buckets else \
            default_buckets(self.max_batch)
        if self._dp > 1:
            # every compiled batch size must shard evenly over dp
            self.buckets = tuple(sorted(
                {-(-b // self._dp) * self._dp for b in self.buckets}))
        if self.buckets[-1] < self.max_batch:
            raise ValueError("largest bucket must cover max_batch")
        self.frame_shape = tuple(frame_shape)
        self.window = int(window)

        # [B, W, H, Wd, 3] uint8 -> captions [B, 1+max_len] int32; shared
        # with rtvc_tpu.export so AOT artifacts serve the identical program.
        self._jit_step = jax.jit(make_caption_step(
            student, max_len=self.max_len, beam=self.beam,
            vocab_int8=self.vocab_int8))

        self._lock = threading.Condition()
        # OrderedDict preserves FIFO arrival while allowing O(1) per-stream
        # replacement; anonymous requests get a unique key.
        self._pending: "OrderedDict[Any, _Request]" = OrderedDict()
        self._anon_counter = 0
        self._closed = False
        self._stats_lock = threading.Lock()
        # bounded windows (a long-lived server must not grow per-request
        # state without bound); totals are kept as scalar counters
        self.batch_sizes: "deque[int]" = deque(maxlen=STATS_WINDOW)
        self.latencies_s: "deque[float]" = deque(maxlen=STATS_WINDOW)
        self._n_batches = 0
        self._batch_rows_total = 0
        self._served = 0
        self._superseded = 0
        self._t_first: Optional[float] = None
        self._t_last: Optional[float] = None

        if warmup:
            self.warmup()

        self._thread = threading.Thread(target=self._scheduler_loop,
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API

    def _place(self, frames_np: np.ndarray):
        """Host batch -> device: dp-sharded over the mesh, or single-device."""
        import jax.numpy as jnp
        if self._dp > 1:
            from .parallel.mesh import shard_batch
            return shard_batch(frames_np, self.mesh)
        return jnp.asarray(frames_np)

    def warmup(self) -> None:
        """Compile + execute every bucket once so no live request ever eats
        a compile."""
        for b in self.buckets:
            dummy = np.zeros((b, self.window) + self.frame_shape, np.uint8)
            np.asarray(self._jit_step(self.variables, self._place(dummy)))

    def submit(self, window: np.ndarray,
               stream_id: Optional[str] = None) -> CaptionFuture:
        """Enqueue one [window, H, W, 3] uint8 clip. Thread-safe."""
        window = np.asarray(window)
        expect = (self.window,) + self.frame_shape
        if window.shape != expect:
            raise ValueError(f"window shape {window.shape} != {expect}")
        req = _Request(window, stream_id)
        with self._lock:
            if self._closed:
                raise RuntimeError("server closed")
            if stream_id is not None:
                old = self._pending.pop(stream_id, None)
                if old is not None:
                    old.future._resolve(None, None, superseded=True)
                    with self._stats_lock:
                        self._superseded += 1
                key: Any = stream_id
            else:
                self._anon_counter += 1
                key = ("_anon", self._anon_counter)
            self._pending[key] = req
            self._lock.notify()
        return req.future

    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            lat = sorted(self.latencies_s)  # recent STATS_WINDOW samples
            out: Dict[str, float] = {
                "served": float(self._served),
                "superseded": float(self._superseded),
                "batches": float(self._n_batches),
                "mean_batch": (self._batch_rows_total /
                               max(self._n_batches, 1)),
            }
            if lat:
                out["latency_p50_ms"] = lat[len(lat) // 2] * 1e3
                out["latency_p95_ms"] = lat[int(len(lat) * 0.95)
                                            if len(lat) > 1 else 0] * 1e3
            if (self._t_first is not None and self._t_last is not None
                    and self._t_last > self._t_first):
                out["throughput_windows_per_s"] = (
                    self._served / (self._t_last - self._t_first))
            return out

    def close(self, timeout: float = 5.0) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._thread.join(timeout)
        with self._lock:
            for req in self._pending.values():
                req.future._resolve(None, None,
                                    error=RuntimeError("server closed"))
            self._pending.clear()

    def __enter__(self) -> "BatchCaptionServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------ scheduler

    def _take_batch(self) -> List[_Request]:
        """Block until work exists, linger max_wait_ms for coalescing, then
        take up to max_batch requests FIFO."""
        with self._lock:
            while not self._pending and not self._closed:
                self._lock.wait(0.1)
            if self._closed and not self._pending:
                return []
            if self.max_wait_s > 0:
                deadline = time.perf_counter() + self.max_wait_s
                while (len(self._pending) < self.max_batch
                       and not self._closed):
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    self._lock.wait(remaining)
            batch: List[_Request] = []
            while self._pending and len(batch) < self.max_batch:
                _, req = self._pending.popitem(last=False)
                batch.append(req)
            return batch

    def _scheduler_loop(self) -> None:
        while True:
            batch = self._take_batch()
            if not batch:
                with self._lock:
                    if self._closed and not self._pending:
                        return
                continue
            try:
                n = len(batch)
                bucket = next(b for b in self.buckets if b >= n)
                frames = np.zeros(
                    (bucket, self.window) + self.frame_shape, np.uint8)
                for i, req in enumerate(batch):
                    frames[i] = req.window
                tokens = np.asarray(
                    self._jit_step(self.variables, self._place(frames)))
                now = time.perf_counter()
                with self._stats_lock:
                    self.batch_sizes.append(n)
                    self._n_batches += 1
                    self._batch_rows_total += n
                    if self._t_first is None:
                        self._t_first = now
                    self._t_last = now
                    self._served += n
                for i, req in enumerate(batch):
                    row = truncate_at_sep(tokens[i])
                    text = self.tokenizer.decode(row,
                                                 skip_special_tokens=True)
                    req.future._resolve(text, row)
                    with self._stats_lock:
                        lat = req.future.latency_s
                        if lat is not None:
                            self.latencies_s.append(lat)
            except Exception as e:  # resolve rather than wedge clients
                for req in batch:
                    if not req.future.done():
                        req.future._resolve(None, None, error=e)


# ---------------------------------------------------------------- CLI demo

def add_frontend_cli_args(p) -> None:
    """The CLI surface shared by the HTTP and gRPC front-end mains
    (each main adds its own --port with its protocol's default)."""
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (data/io.py layout); random init "
                        "if omitted")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=4.0)
    p.add_argument("--beam", type=int, default=0,
                   help="0 = greedy; K>0 = batch beam search width K")
    p.add_argument("--frame-size", type=int, default=224,
                   help="expected square frame edge of incoming windows")


def build_serving_student(ckpt: Optional[str] = None):
    """Student + serving variables: random init, or checkpoint restore via
    the same loading path inference.py uses. THE single model-load block
    for every deployment surface (HTTP/gRPC fronts via
    server_from_frontend_args, and the AOT export CLI) — so an exported
    program can never drift from the served one through loading semantics.
    Returns ``(student, variables)``."""
    import jax
    import jax.numpy as jnp

    from .config import cfg
    from .models.student import student_from_config
    from .real_time_inference import WINDOW

    if ckpt:
        # rebuild the student with the activation the weights were trained
        # under (checkpoint sidecar meta), mirroring inference.py
        from .models.student import student_matching_checkpoint
        student = student_matching_checkpoint(cfg, ckpt)
    else:
        student = student_from_config(cfg)
    dummy_f = jnp.zeros((1, WINDOW, 224, 224, 3))
    dummy_y = jnp.array([[student.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(student.init)(jax.random.PRNGKey(cfg.seed),
                                      dummy_f, dummy_y)
    if ckpt:
        # load_kd_student_params strips the distillation-only heads — the
        # same inference-loading path inference.py uses
        from .data.io import load_kd_student_params
        restored = load_kd_student_params(ckpt)
        variables = {**variables, "params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    return student, variables


def server_from_frontend_args(a) -> "BatchCaptionServer":
    """build_serving_student + the BatchCaptionServer behind a network
    front-end — shared by serving_http.main and serving_grpc.main."""
    from .real_time_inference import WINDOW
    from .tokenization import BertWordPieceTokenizer

    student, variables = build_serving_student(a.ckpt)
    return BatchCaptionServer(
        student, variables, BertWordPieceTokenizer(),
        max_batch=a.max_batch, max_wait_ms=a.max_wait_ms, beam=a.beam,
        frame_shape=(a.frame_size, a.frame_size, 3), window=WINDOW)


def simulate_streams(source: str, *, n_streams: int = 8,
                     windows_per_stream: int = 16, max_batch: int = 8,
                     max_wait_ms: float = 4.0, beam: int = 0,
                     config=None) -> Dict[str, float]:
    """Replay one clip as N concurrent streams against a fresh server
    (random weights) and report the serving stats — the measurable
    cross-stream batching number for docs/PERF.md."""
    import jax
    import jax.numpy as jnp

    from .config import cfg as default_cfg
    from .models.student import student_from_config
    from .real_time_inference import WINDOW, shrink_frame
    from .tokenization import BertWordPieceTokenizer

    config = config or default_cfg
    student = student_from_config(config)
    rng = jax.random.PRNGKey(config.seed)
    dummy_f = jnp.zeros((1, WINDOW, 224, 224, 3))
    dummy_y = jnp.array([[student.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(student.init)(rng, dummy_f, dummy_y)

    # pull windows from the source once; every stream replays them
    import cv2
    cap = cv2.VideoCapture(source)
    frames: List[np.ndarray] = []
    while len(frames) < WINDOW * windows_per_stream:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(shrink_frame(frame))
    cap.release()
    if len(frames) < WINDOW:
        raise RuntimeError(f"source {source!r} too short")
    wins = [np.stack(frames[i:i + WINDOW])
            for i in range(0, len(frames) - WINDOW + 1, WINDOW)]

    server = BatchCaptionServer(
        student, variables, BertWordPieceTokenizer(),
        max_batch=max_batch, max_wait_ms=max_wait_ms, beam=beam,
        frame_shape=wins[0].shape[1:])

    results: List[Optional[str]] = []
    res_lock = threading.Lock()

    def stream_worker(sid: int) -> None:
        for j in range(windows_per_stream):
            fut = server.submit(wins[j % len(wins)], stream_id=f"s{sid}")
            text = fut.result(timeout=120)
            with res_lock:
                results.append(text)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=stream_worker, args=(s,))
               for s in range(n_streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = server.stats()
    server.close()
    stats["wall_s"] = wall
    stats["streams"] = float(n_streams)
    stats["windows_per_s_wall"] = len(results) / wall
    return stats


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("source", help="video file replayed by every stream")
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--windows", type=int, default=16,
                   help="windows per stream")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=4.0)
    p.add_argument("--beam", type=int, default=0,
                   help="0 = greedy; K>0 = batch beam search width K")
    a = p.parse_args(argv)
    stats = simulate_streams(a.source, n_streams=a.streams,
                             windows_per_stream=a.windows,
                             max_batch=a.max_batch,
                             max_wait_ms=a.max_wait_ms, beam=a.beam)
    for k, v in sorted(stats.items()):
        print(f"{k:28s} {v:.3f}" if isinstance(v, float) else f"{k} {v}")


if __name__ == "__main__":
    main()
