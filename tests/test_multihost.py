"""Multi-host execution test: 2 real jax.distributed processes on CPU.

Spawns two worker processes (tests/multihost_worker.py), each one
controller of a 2-process × 4-virtual-device cluster — a genuine
multi-controller run over gRPC on localhost, the same code path a TPU pod
takes (train.main --multihost → parallel/multihost.py), just with DCN
swapped for loopback. The workers train one epoch on host-local halves of
a fixed global batch; the parent trains the identical global batch
single-process on its 8-virtual-device mesh and the loss histories must
match.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# Distributed-runtime infra failures seen when BOTH workers share one
# starved CPU core (the sandbox's case): Gloo's context rendezvous has a
# hard-coded 30 s KV timeout that fires while the peer is still inside an
# XLA compile. These are properties of the host, not of the code under
# test — the loss-equality assertion below is never skipped once the
# workers actually run.
_INFRA_SIGNATURES = (
    "Gloo context initialization failed",
    "GetKeyValue() timed out",
    "DEADLINE_EXCEEDED",
    "Connect timeout",
)


def _run_workers(tmp_path, attempt):
    env = dict(os.environ)
    # workers configure their own platform/device-count (4 devices each)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # data-plane transfers must ride loopback like the coordinator does —
    # Gloo otherwise binds the primary interface, which offline sandboxes
    # firewall (observed: "Connect timeout" on an egress-blocked eth0)
    env.setdefault("GLOO_SOCKET_IFNAME", "lo")
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(_TESTS_DIR, "multihost_worker.py")
    logs = [open(tmp_path / f"worker{i}.a{attempt}.log", "w")
            for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i), str(tmp_path)],
        env=env, stdout=logs[i], stderr=subprocess.STDOUT,
        cwd=os.path.dirname(_TESTS_DIR)) for i in range(2)]
    try:
        codes = [p.wait(timeout=1200) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        codes = [-1, -1]
    for log in logs:
        log.close()
    dumps = "\n".join(
        (tmp_path / f"worker{i}.a{attempt}.log").read_text()[-2000:]
        for i in range(2))
    return codes, dumps


@pytest.mark.slow
def test_two_process_distributed_loss_matches_single(tmp_path):
    # Two attempts: the first run warms the persistent XLA compile cache
    # even when it dies in the Gloo rendezvous, so a starvation-induced
    # infra timeout usually clears on retry (compiles become near-instant).
    for attempt in range(2):
        codes, dumps = _run_workers(tmp_path, attempt)
        if not any(codes):
            break
        if not any(sig in dumps for sig in _INFRA_SIGNATURES):
            pytest.fail(f"worker exit codes {codes}\n{dumps}")
    else:
        sig = next(s for s in _INFRA_SIGNATURES if s in dumps)
        pytest.skip("2-process jax.distributed run starved by this host "
                    f"(single CPU core): {sig!r} after 2 attempts")

    with open(tmp_path / "losses.json") as f:
        mh_losses = json.load(f)["train_loss"]

    # single-process reference: identical models/batches on this process's
    # 8-virtual-device dp mesh (same global mesh shape as the 2-proc run)
    from test_train import synth_batch, tiny_pair

    import jax
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer
    from rtvc_tpu.train import train

    student, teacher = tiny_pair()
    loader = [synth_batch(seed=s) for s in (0, 1)]
    config = from_dict({
        "logger": {"save_dir": str(tmp_path / "single")},
        "train": {"lr": 1e-3, "batch_size": 8,
                  "trainer": {"max_epochs": 1,
                              "enable_checkpointing": False}},
        "wandb": {"mode": "disabled"},
    })
    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])
    _, hist = train(config, loader, [], [], BertWordPieceTokenizer(),
                    run_name="single", student=student, teacher=teacher,
                    teacher_vars=tvars, max_epochs=1, use_orbax=False)

    np.testing.assert_allclose(mh_losses, hist["train_loss"], rtol=2e-4,
                               err_msg="2-process loss != single-process")


def test_host_slice_loader_partitions_batches():
    """DeviceLoader host_slice: the two hosts' rows tile each global batch
    window exactly, in the same seeded global order."""
    import pandas as pd
    from rtvc_tpu.data.dataset import CaptionDataset, DeviceLoader

    ids = [f"v{i}" for i in range(8)]
    df = pd.DataFrame({"image_id": ids, "id": range(8)})
    enc = {i: [101, 10 + i] for i in range(8)}

    class _NoFrames(CaptionDataset):
        def _load_frames(self, vid_id):
            return np.full((2, 8, 8, 3), int(vid_id[1:]), np.uint8)

    ds = _NoFrames(".", ids, df, enc, num_frames=2)
    full = DeviceLoader(ds, 4, shuffle=True, seed=3, drop_last=True,
                        preprocess=False)
    h0 = DeviceLoader(ds, 4, shuffle=True, seed=3, drop_last=True,
                      preprocess=False, host_slice=(0, 2))
    h1 = DeviceLoader(ds, 4, shuffle=True, seed=3, drop_last=True,
                      preprocess=False, host_slice=(2, 4))
    for bf, b0, b1 in zip(full, h0, h1):
        assert bf["vid-id"] == b0["vid-id"] + b1["vid-id"]
        np.testing.assert_array_equal(
            np.asarray(bf["caption"]),
            np.concatenate([np.asarray(b0["caption"]),
                            np.asarray(b1["caption"])]))

    with pytest.raises(ValueError, match="drop_last"):
        DeviceLoader(ds, 4, host_slice=(0, 2))
