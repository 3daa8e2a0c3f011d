"""gRPC transport load test: N concurrent CaptionStream RPCs over loopback
against an in-process CaptionGRPCFrontend (full-size student, random
weights). The in-process analog is ``serving.simulate_streams`` — the delta
between the two is the cost of the gRPC boundary (serialization + loopback
TCP + one pinned worker thread per RPC).

Each window carries a unique stream_id so nothing supersedes: this measures
throughput, not freshness. Results feed docs/PERF.md §5a.

Usage: python scripts/grpc_load_test.py [--streams 8] [--windows 8]
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rtvc_tpu.config import cfg
    from rtvc_tpu.models.student import student_from_config
    from rtvc_tpu.real_time_inference import WINDOW
    from rtvc_tpu.serving import BatchCaptionServer
    from rtvc_tpu.serving_grpc import (CaptionClient, CaptionGRPCFrontend,
                                       encode_window)
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--windows", type=int, default=8, help="per stream")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=4.0)
    p.add_argument("--frame-size", type=int, default=224)
    p.add_argument("--compress", default=None, choices=[".jpg", ".png"],
                   help="send encoded_frames instead of raw bytes on the "
                        "gRPC arm (serving.compress_window)")
    p.add_argument("--quality", type=int, default=90)
    p.add_argument("--content", default="noise", choices=["noise", "smooth"],
                   help="'smooth' = coarse noise upsampled 16x (camera-like "
                        "spatial correlation; JPEG-representative). 'noise' "
                        "= iid pixels (JPEG worst case; the recorded raw-arm "
                        "numbers in docs/PERF.md used this)")
    a = p.parse_args()

    print(f"backend={jax.default_backend()} streams={a.streams} "
          f"windows/stream={a.windows} max_batch={a.max_batch}", flush=True)

    student = student_from_config(cfg)
    dummy_f = jnp.zeros((1, WINDOW, 224, 224, 3))
    dummy_y = jnp.array([[student.cls_token_id, 5]], jnp.int32)
    variables = jax.jit(student.init)(jax.random.PRNGKey(cfg.seed),
                                      dummy_f, dummy_y)
    server = BatchCaptionServer(
        student, variables, BertWordPieceTokenizer(),
        max_batch=a.max_batch, max_wait_ms=a.max_wait_ms,
        frame_shape=(a.frame_size, a.frame_size, 3), window=WINDOW)

    # distinct window per (stream, slot): the tunnel dedupes identical
    # dispatches, and distinct pixels keep the decode honest
    rng = np.random.default_rng(0)

    def make_window() -> np.ndarray:
        if a.content == "smooth":
            # ceil so the upsampled window covers frame_size, then crop
            # back — any --frame-size works, not just multiples of 16
            edge = -(-a.frame_size // 16)
            coarse = rng.integers(0, 255, size=(WINDOW, edge, edge, 3))
            up = np.repeat(np.repeat(coarse, 16, axis=1), 16, axis=2)
            return up[:, :a.frame_size, :a.frame_size].astype(np.uint8)
        return rng.integers(0, 255, size=(WINDOW, a.frame_size,
                                          a.frame_size, 3), dtype=np.uint8)

    wins = [[make_window() for _ in range(a.windows)]
            for _ in range(a.streams)]

    if a.compress:
        from rtvc_tpu.serving import compress_window
        sizes = [sum(len(b) for b in compress_window(
                     w, fmt=a.compress, quality=a.quality))
                 for w in wins[0]]
        raw = wins[0][0].nbytes
        print(f"compress={a.compress} q{a.quality} content={a.content}: "
              f"{np.mean(sizes) / 1e3:.1f} KB/window vs raw {raw / 1e3:.1f} "
              f"KB ({raw / np.mean(sizes):.1f}x smaller)", flush=True)

    total = a.streams * a.windows

    # -- in-process arm FIRST (same server, same windows, same tunnel
    # moment): the gRPC delta is then pure transport cost, not tunnel luck
    def inprocess_run() -> float:
        futs = []
        t0 = time.perf_counter()
        for sid in range(a.streams):
            for j, w in enumerate(wins[sid]):
                futs.append(server.submit(w, stream_id=f"ip_s{sid}w{j}"))
        for f in futs:
            f.result(timeout=300)
        return time.perf_counter() - t0

    wall_ip = inprocess_run()
    print(f"in-process: {wall_ip:.2f}s -> {total / wall_ip:.1f} windows/s",
          flush=True)

    counts = {"replies": 0, "errors": 0}
    lock = threading.Lock()

    with CaptionGRPCFrontend(server, port=0,
                             max_workers=a.streams + 8) as fe:
        target = f"127.0.0.1:{fe.port}"

        def stream_worker(sid: int) -> None:
            with CaptionClient(target) as client:
                reqs = (encode_window(w, stream_id=f"s{sid}w{j}", seq=j,
                                      compress=a.compress, quality=a.quality)
                        for j, w in enumerate(wins[sid]))
                for reply in client.caption_stream(reqs):
                    with lock:
                        counts["replies"] += 1
                        if reply.error or reply.superseded:
                            counts["errors"] += 1

        threads = [threading.Thread(target=stream_worker, args=(s,))
                   for s in range(a.streams)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        with CaptionClient(target) as client:
            stats = client.stats()

    server.close()
    print(f"replies: {counts['replies']}/{total} "
          f"(errors/superseded: {counts['errors']})", flush=True)
    print(f"gRPC:       {wall:.2f}s -> {total / wall:.1f} windows/s "
          f"({wall / wall_ip:.2f}x in-process wall)", flush=True)
    for k in sorted(stats):
        print(f"  {k:26s} {stats[k]:.2f}", flush=True)


if __name__ == "__main__":
    main()
