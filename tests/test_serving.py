"""Multi-stream batched serving tests (rtvc_tpu/serving.py).

Pins the exactness contract (batched caption == single-request caption),
the bucket-padding invariance, per-stream latest-window supersession, and
that the scheduler actually coalesces concurrent streams into one batch.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu import serving
from rtvc_tpu.serving import (BatchCaptionServer, default_buckets,
                              truncate_at_sep)
from rtvc_tpu.tokenization import BertWordPieceTokenizer

from test_models import tiny_student

WINDOW = 3
FRAME = (64, 64, 3)


@pytest.fixture(scope="module")
def served_student():
    model = tiny_student(dropout=0.0)
    # init at the post-preprocess spatial size (clip_preprocess always
    # emits 224x224; the raw frame size only affects the host->device copy)
    frames = jnp.zeros((1, WINDOW, 224, 224, 3), jnp.float32)
    y = jnp.array([[model.cls_token_id, 5]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, y)
    return model, variables


def _windows(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, size=(WINDOW,) + FRAME).astype(np.uint8)
            for _ in range(n)]


def _server(model, variables, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_wait_ms", 30.0)
    kw.setdefault("max_len", 8)
    kw.setdefault("frame_shape", FRAME)
    kw.setdefault("window", WINDOW)
    return BatchCaptionServer(model, variables, BertWordPieceTokenizer(),
                              **kw)


def test_default_buckets():
    assert default_buckets(1) == (1,)
    assert default_buckets(8) == (1, 2, 4, 8)
    assert default_buckets(6) == (1, 2, 4, 6)


def test_truncate_at_sep():
    row = np.array([101, 7, 9, 102, 4, 0])
    np.testing.assert_array_equal(truncate_at_sep(row), [101, 7, 9])
    row = np.array([101, 7, 9])
    np.testing.assert_array_equal(truncate_at_sep(row), row)


def test_batched_equals_single_request(served_student):
    """The exactness contract: any window captioned through a shared batch
    gets the same text as a dedicated batch-1 submission."""
    model, variables = served_student
    wins = _windows(5)

    with _server(model, variables, max_wait_ms=0.0) as solo:
        singles = [solo.submit(w).result(timeout=60) for w in wins]

    with _server(model, variables, max_wait_ms=50.0, max_batch=4) as batched:
        futs = [batched.submit(w) for w in wins]  # 5 -> batch 4 + batch 1
        texts = [f.result(timeout=60) for f in futs]
        sizes = list(batched.batch_sizes)

    assert texts == singles
    assert sum(sizes) == 5
    assert max(sizes) > 1  # the linger actually coalesced


def test_dp_mesh_serving_matches_single_device(served_student):
    """mesh=: params replicate, batches shard over dp, buckets round up to
    dp multiples — captions must equal the single-device server's."""
    from rtvc_tpu.parallel.mesh import make_mesh

    model, variables = served_student
    mesh = make_mesh((4, 1))  # dp=4 over the 8 virtual CPU devices
    wins = _windows(5, seed=3)

    with _server(model, variables, max_wait_ms=0.0) as solo:
        singles = [solo.submit(w).result(timeout=120) for w in wins]

    with _server(model, variables, max_wait_ms=50.0, max_batch=6,
                 mesh=mesh) as dp_srv:
        assert dp_srv.max_batch == 8          # 6 rounded up to dp multiple
        assert dp_srv.buckets == (4, 8)       # every bucket divisible by 4
        futs = [dp_srv.submit(w) for w in wins]
        texts = [f.result(timeout=120) for f in futs]
        sizes = list(dp_srv.batch_sizes)
    assert texts == singles
    assert max(sizes) > 1  # coalesced across the sharded program


@pytest.mark.slow
def test_beam_serving_matches_direct_beam(served_student):
    """beam=K routes the bucket-compiled program through student_beam; a
    served caption must equal decoding the same window directly, and the
    greedy/beam switch must actually change the program (not silently
    greedy)."""
    from rtvc_tpu import decode as decode_lib
    from rtvc_tpu.ops.preprocess import clip_preprocess

    model, variables = served_student
    wins = _windows(3, seed=7)

    @jax.jit
    def _step(v, frames_u8):  # mirror BatchCaptionServer.step at batch 1
        flat = frames_u8.reshape((-1,) + frames_u8.shape[2:])
        proc = clip_preprocess(flat)
        proc = proc.reshape((1, WINDOW) + proc.shape[1:])
        return decode_lib.student_beam(model, v, proc, max_len=8, k=2)

    def direct_beam(win):
        tokens = np.asarray(_step(variables, jnp.asarray(win[None])))[0]
        row = serving.truncate_at_sep(tokens)
        return BertWordPieceTokenizer().decode(row, skip_special_tokens=True)

    expected = [direct_beam(w) for w in wins]
    with _server(model, variables, max_wait_ms=50.0, max_batch=4,
                 beam=2) as srv:
        futs = [srv.submit(w) for w in wins]
        texts = [f.result(timeout=120) for f in futs]
        sizes = list(srv.batch_sizes)
    assert texts == expected
    assert max(sizes) > 1  # exactness held THROUGH a shared batch


def test_bucket_padding_is_inert(served_student):
    """3 requests pad to bucket 4; pad rows must not perturb real rows."""
    model, variables = served_student
    wins = _windows(3, seed=1)

    with _server(model, variables, max_wait_ms=0.0) as solo:
        singles = [solo.submit(w).result(timeout=60) for w in wins]

    with _server(model, variables, max_wait_ms=500.0, max_batch=4) as srv:
        futs = [srv.submit(w) for w in wins]
        texts = [f.result(timeout=60) for f in futs]
        assert list(srv.batch_sizes) == [3]

    assert texts == singles


def test_latest_window_supersedes(served_student):
    """A newer window from the same stream replaces a queued older one."""
    model, variables = served_student
    w1, w2 = _windows(2, seed=2)

    srv = _server(model, variables, max_wait_ms=1500.0, max_batch=2)
    try:
        # the 1.5 s linger holds the scheduler open so both submits land
        # before any batch forms; the second replaces the first in-queue
        f1 = srv.submit(w1, stream_id="cam0")
        f2 = srv.submit(w2, stream_id="cam0")
        assert f1.result(timeout=60) is None
        assert f1.superseded
        assert f2.result(timeout=60) is not None
        assert not f2.superseded
        assert srv.stats()["superseded"] == 1.0
    finally:
        srv.close()


def test_distinct_streams_both_served(served_student):
    model, variables = served_student
    w1, w2 = _windows(2, seed=3)
    with _server(model, variables) as srv:
        f1 = srv.submit(w1, stream_id="a")
        f2 = srv.submit(w2, stream_id="b")
        assert f1.result(timeout=60) is not None
        assert f2.result(timeout=60) is not None
        assert srv.stats()["served"] == 2.0


def test_concurrent_stream_threads(served_student):
    """N threads x M windows each all complete and text matches solo."""
    model, variables = served_student
    wins = _windows(4, seed=4)
    with _server(model, variables, max_wait_ms=0.0) as solo:
        singles = {i: solo.submit(w).result(timeout=60)
                   for i, w in enumerate(wins)}

    results = {}
    lock = threading.Lock()
    with _server(model, variables, max_wait_ms=5.0) as srv:
        def worker(sid):
            for j in range(3):
                w_idx = (sid + j) % len(wins)
                fut = srv.submit(wins[w_idx], stream_id=f"s{sid}")
                text = fut.result(timeout=60)
                with lock:
                    results[(sid, j)] = (w_idx, text)

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = srv.stats()

    # a worker waits on each submit before the next, so nothing here can
    # legally supersede
    assert stats["superseded"] == 0.0
    assert stats["served"] == 12.0
    for (sid, j), (w_idx, text) in results.items():
        assert text == singles[w_idx], (sid, j)


def test_submit_shape_validation(served_student):
    model, variables = served_student
    with _server(model, variables) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((WINDOW, 16, 16, 3), np.uint8))


def test_closed_server_rejects(served_student):
    model, variables = served_student
    srv = _server(model, variables)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(_windows(1)[0])


def test_error_propagates_to_future(served_student):
    """A failing step resolves futures with the error instead of hanging."""
    model, variables = served_student
    srv = _server(model, variables, warmup=False)
    try:
        srv._jit_step = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("boom"))
        fut = srv.submit(_windows(1, seed=5)[0])
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=60)
    finally:
        srv.close()


def test_decode_compressed_rejects_bomb_before_full_decode():
    """A constant-color PNG compresses >1000:1, so a tiny blob could
    otherwise materialize GBs; with the server's expected shape passed in,
    decode must abort on the FIRST wrong-shaped frame (ADVICE r3)."""
    import cv2

    from rtvc_tpu.serving import compress_window, decode_compressed_frames

    big = np.zeros((2048, 2048, 3), np.uint8)  # ~12 MB decoded, ~KB encoded
    ok, buf = cv2.imencode(".png", big)
    assert ok and len(buf) < 50_000
    bomb = [buf.tobytes()] * 3
    with pytest.raises(ValueError, match="decodes to"):
        decode_compressed_frames(bomb, expect_shape=(3, 64, 64, 3))
    # blob-count mismatch is rejected before any decode happens
    with pytest.raises(ValueError, match="server window"):
        decode_compressed_frames(bomb[:2], expect_shape=(3, 2048, 2048, 3))
    # the happy path is unchanged by the check
    win = np.arange(3 * 64 * 64 * 3, dtype=np.uint8).reshape(3, 64, 64, 3)
    out = decode_compressed_frames(compress_window(win, fmt=".png"),
                                   expect_shape=(3, 64, 64, 3))
    np.testing.assert_array_equal(out, win)
