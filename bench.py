"""End-to-end captioning benchmark on the flagship student model.

Measures the real-time pipeline the reference targets (SURVEY.md §6,
BASELINE.md): one 6-frame 224px clip → fused preprocessing → TinyViT-21M
encode → KV-cache greedy decode (max_len 25, the webcam setting,
reference real_time_inference.py:58) on one chip, batch 1 (the streaming
case).

Reported metric: ``device_captioning_fps`` — the maximum camera frame rate
the CHIP sustains. The loop keeps every 3rd camera frame and captions per
6-frame window (reference :44-58), i.e. one caption covers 18 source
frames, so sustainable fps = 18 / device_window_time. The window time is
measured with no tunnel in the timed path (pre-uploaded windows scanned
inside one dispatch, two scan lengths, delta cancels the fetch RTT the
short dispatch pays), so BENCH_rN vs BENCH_rN+1 compares builder work, not
link weather: rounds 1-4 published the link-riding pipelined fps as the
headline and it swung 347-1277 on identical code as the axon tunnel's
bandwidth moved (15-29 MB/s session to session) — r4's 864.54 "regression"
vs r3's 911.14 happened while every chip signal improved ~30%
(docs/PERF.md §4/§5; VERDICT r4 weak #1). The driver-set target is
>= 30 fps (vs_baseline = fps / 30). The link-dependent end-to-end number
still ships alongside as ``pipelined_e2e_fps`` + ``link_mb_per_s``.

Secondary numbers (stderr): p50/p90 caption latency, clips/sec at batch 1
and batch 8 (training-shaped throughput).

Run: ``python bench.py`` (uses the default backend — the real TPU chip under
the driver; CPU works for smoke runs). One JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rtvc_tpu.decode import student_greedy
    from rtvc_tpu.models.student import StudentCandidateV1
    from rtvc_tpu.models.tinyvit import tiny_vit_21m_config
    from rtvc_tpu.ops.preprocess import clip_preprocess

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    from rtvc_tpu.config import cfg

    compute_dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    student = StudentCandidateV1(
        encoder_config=tiny_vit_21m_config(
            dtype=compute_dtype,
            # shipping default (cfg.student): tanh GELU — the measured
            # encoder lever (docs/PERF.md §1b); parity tests pin exact mode
            gelu_approximate=cfg.student.gelu_approximate),
        dtype=compute_dtype)

    rng = jax.random.PRNGKey(0)
    init_frames = jnp.zeros((1, 6, 224, 224, 3), jnp.float32)
    init_caps = jnp.zeros((1, 40), jnp.int32)
    t0 = time.perf_counter()
    # jit the init: unjitted flax init dispatches thousands of tiny ops
    # individually (≈300s over the TPU tunnel); compiled it is one program
    variables = jax.jit(student.init)(rng, init_frames, init_caps)
    jax.block_until_ready(variables)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    log(f"student params: {n_params / 1e6:.1f}M "
        f"(init {time.perf_counter() - t0:.1f}s)")
    variables = jax.device_put(variables)

    max_len = 25  # webcam setting (reference real_time_inference.py:58)

    def caption_clip(variables, raw_frames):
        proc = clip_preprocess(raw_frames)             # [6, 224, 224, 3]
        return student_greedy(student, variables, proc[None], max_len=max_len)

    step = jax.jit(caption_clip)

    from rtvc_tpu.real_time_inference import shrink_frame

    def host_resize(clip_u8: np.ndarray) -> np.ndarray:
        """Grabber-side shrink + center crop (the streaming loop's
        shrink_frame): 5.5 MB of raw 480p becomes 0.9 MB on the
        host→device link; pixel-identical to shipping the uncropped
        shrink (the device's same-size bicubic resize is the identity,
        its crop a no-op)."""
        return np.stack([shrink_frame(f) for f in clip_u8])

    # DISTINCT clip per iteration: the tunnel runtime can serve repeated
    # identical dispatches from cache, which would inflate throughput
    host_rng = np.random.default_rng(0)
    raw_clips = [host_rng.integers(0, 255, size=(6, 480, 640, 3),
                                   dtype=np.uint8) for _ in range(40)]

    # Tunnel-health probe: the streaming leg is upload-bound over the axon
    # link (0.9 MB/window), so the headline fps tracks link bandwidth, not
    # chip speed (docs/PERF.md §4/§5). Log the measured host→device rate so
    # every bench run self-documents which regime it ran in (observed
    # 15-29 MB/s across sessions → ~300-810 fps for the same code).
    # device_put alone returns after the local enqueue — a device-side
    # reduction FETCHED back is the only reliable proof the bytes crossed
    # (same tunnel caveat as block_until_ready, docs/PERF.md §4). Each rep
    # pays the ~30 ms fetch-RTT floor on top of the transfer, so time a
    # 4 MB and a 4 KB buffer and take bandwidth from the DELTA — otherwise
    # the floor biases the reading ~10-25% low on a healthy link.
    def timed_upload(n_bytes: int, reps: int = 3) -> float:
        buf = host_rng.integers(0, 255, size=(n_bytes,), dtype=np.uint8)
        consume = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        np.asarray(consume(jax.device_put(buf)))  # warm the path + compile
        t0 = time.perf_counter()
        for _ in range(reps):
            buf[0] += 1  # distinct buffer per rep (defeat transfer caching)
            np.asarray(consume(jax.device_put(buf)))
        return (time.perf_counter() - t0) / reps

    t_big, t_tiny = timed_upload(4 * 2**20), timed_upload(4 * 2**10)
    h2d = (4 * 2**20 - 4 * 2**10) / max(t_big - t_tiny, 1e-9) / 2**20
    log(f"host->device link: {h2d:.1f} MB/s, rtt floor {t_tiny * 1e3:.1f} ms"
        f" (streaming leg uploads 0.9 MB/window)")

    # warmup / compile
    t0 = time.perf_counter()
    np.asarray(step(variables, jnp.asarray(host_resize(raw_clips[0]))))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # Greedy decode on random weights can stop after 1 step if argmax emits
    # SEP immediately — check how many tokens were produced.
    tokens = np.asarray(step(variables, jnp.asarray(host_resize(raw_clips[0]))))
    produced = int((tokens != 0).sum(axis=1)[0])
    log(f"tokens produced per caption: {produced} (max {max_len + 1})")

    # --- single-in-flight latency (camera window → caption text) ----------
    lat = []
    for i in range(30):
        clip = raw_clips[i]
        t0 = time.perf_counter()
        np.asarray(step(variables, jnp.asarray(host_resize(clip))))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    p50, p90 = float(np.percentile(lat, 50)), float(np.percentile(lat, 90))
    log(f"caption latency p50={p50 * 1e3:.1f}ms p90={p90 * 1e3:.1f}ms")

    # --- pipelined streaming throughput (grabber overlaps compute) --------
    shrunk = [host_resize(c) for c in raw_clips]
    t0 = time.perf_counter()
    outs = []
    for i in range(40):
        outs.append(step(variables, jnp.asarray(shrunk[i])))
    # fetch the LAST output's value: block_until_ready does not reliably
    # block through the axon tunnel, but the device executes programs in
    # submission order, so the last result completing proves all 40 did.
    # (Per-caption text fetches overlap the next window's compute in the
    # real-time loop, so they don't serialize steady-state throughput.)
    np.asarray(outs[-1])
    window_time = (time.perf_counter() - t0) / 40
    log(f"pipelined streaming: {window_time * 1e3:.1f} ms/window "
        f"({1 / window_time:.1f} windows/s)")

    # --- device-only caption latency (chip signal; no tunnel in the timed
    # path). The single-in-flight p50 above times host resize + the 0.9 MB
    # upload + decode + fetch — serving-relevant but link-sensitive. For a
    # round-over-round CHIP comparison, scan the caption program over
    # pre-uploaded windows inside ONE jitted dispatch with a checksum
    # carried out, and time TWO scan lengths (1 pass vs 1+K passes over the
    # same 16 windows): both dispatches pay the identical ~30 ms fetch RTT,
    # so the DELTA is pure device time (docs/PERF.md §4 delta method).
    # Round 4 divided a single 16-window dispatch's wall by 16, which left
    # ~2 ms/window of amortized fetch RTT inside the "device-only" number
    # (r4's 4.92 ms vs the true ~2.6 ms chip cost, PERF §5 round-5
    # addendum) and made the headline track the RTT floor.
    def scanned(variables, windows, passes):
        def one_pass(carry, _):
            def body(acc, w):
                # perturb pixels by the running checksum so later passes
                # are not loop-invariant re-runs of the first
                w = w + (acc % 2).astype(w.dtype)
                toks = caption_clip(variables, w)
                return acc + jnp.sum(toks, dtype=jnp.int32), ()
            acc, _ = jax.lax.scan(body, carry, windows)
            return acc, ()
        acc, _ = jax.lax.scan(one_pass, jnp.int32(0), None, length=passes)
        return acc

    sstep = jax.jit(scanned, static_argnums=(2,))
    # 3 distinct pre-uploaded stacks: repeated identical dispatches can be
    # served from the tunnel cache (same caveat as raw_clips above)
    stacks = [jax.device_put(jnp.asarray(np.stack(shrunk[i:i + 16])))
              for i in (0, 8, 16)]
    extra = 3  # long arm = 1 + extra passes
    np.asarray(sstep(variables, stacks[0], 1))          # compile short arm
    np.asarray(sstep(variables, stacks[0], 1 + extra))  # compile long arm
    t_short = t_long = 0.0
    for s in stacks:
        t0 = time.perf_counter()
        np.asarray(sstep(variables, s, 1))
        t_short += time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(sstep(variables, s, 1 + extra))
        t_long += time.perf_counter() - t0
    dev_ms = max(t_long - t_short, 1e-9) / (len(stacks) * extra * 16) * 1e3
    log(f"device-only caption: {dev_ms:.2f} ms/window "
        f"({1e3 / dev_ms:.1f} windows/s on-chip; RTT-cancelled delta over "
        f"{len(stacks)}x{extra * 16} windows)")

    # batched throughput (training/eval shape): clips/sec at batch 8
    def batched(variables, frames_u8):
        b, f = frames_u8.shape[:2]
        flat = frames_u8.reshape((-1,) + frames_u8.shape[2:])
        proc = clip_preprocess(flat).reshape((b, f, 224, 224, 3))
        return student_greedy(student, variables, proc, max_len=max_len)

    bstep = jax.jit(batched)
    batches = [jnp.asarray(host_rng.integers(
        0, 255, size=(8, 6, 224, 224, 3), dtype=np.uint8))
        for _ in range(6)]
    np.asarray(bstep(variables, batches[0]))
    t0 = time.perf_counter()
    for bt in batches:  # distinct inputs; fetch each result
        np.asarray(bstep(variables, bt))
    dt = (time.perf_counter() - t0) / len(batches)
    log(f"batch-8 captioning: {8 / dt:.1f} clips/s ({dt * 1e3:.1f}ms/batch)")

    # One caption covers 18 source frames (keep every 3rd x 6-frame window).
    # HEADLINE (round 5, VERDICT r4 #3): device-anchored — 18 / the
    # scan-isolated device window time, reproducible across link speeds.
    # The link-riding pipelined number ships alongside, clearly named.
    dev_fps = 18.0 / (dev_ms / 1e3)
    pipelined_fps = 18.0 / window_time
    result = {
        "metric": "device_captioning_fps",
        "value": round(dev_fps, 2),
        "unit": ("sustained source fps, device-anchored (18 frames/caption;"
                 " b=1 caption program scanned on-chip, no link in the"
                 " timed path)"),
        "vs_baseline": round(dev_fps / 30.0, 3),
        # The two device-latency definitions, self-describing (VERDICT r4
        # #8): device_b1_ms_per_window times the SINGLE-window caption
        # program (preprocess + encode + greedy decode, batch 1) scanned
        # over pre-uploaded windows, RTT-cancelled via the two-scan-length
        # delta — the streaming steady-state chip cost, and the headline's
        # denominator. (Round 4's 4.92 for this quantity included ~2 ms of
        # amortized fetch RTT; the delta method removes it.)
        # device_batch8_ms_per_clip is the BATCH-8 caption step's per-clip
        # cost (one dispatch per 8-clip batch, result fetched) — the
        # training/eval-shaped throughput signal; it beats b=1 per-clip
        # because batching amortizes decode-step overheads.
        "device_b1_ms_per_window": round(dev_ms, 2),
        "device_batch8_ms_per_clip": round(dt * 1e3 / 8, 2),
        "batch8_clips_per_s": round(8 / dt, 1),
        # Link-dependent end-to-end numbers (previous rounds' headline):
        # pipelined_e2e_fps rides the axon tunnel's upload bandwidth
        # (0.9 MB/window); caption_p50_ms is single-in-flight host resize +
        # upload + decode + fetch. Both track link_mb_per_s, not the chip.
        "pipelined_e2e_fps": round(pipelined_fps, 2),
        "caption_p50_ms": round(p50 * 1e3, 1),
        "link_mb_per_s": round(h2d, 1),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
