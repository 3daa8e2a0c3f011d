"""RunLogger tests, including the wandb channel exercised via a stub module
(wandb is not installed in the sandbox — reference logged to it
unconditionally, train.py:70-73)."""

import json
import sys
import types

import pytest

from rtvc_tpu.utils.logging import RunLogger


def test_run_file_and_scalars(tmp_path):
    logger = RunLogger(str(tmp_path), "t", config_dump={"Learning Rate": 1e-4})
    logger.write("hello\n")
    logger.log_scalars(0, {"train_loss": 1.5})
    logger.log_epoch_transcript("Validation", 0, [["a cat"]], ["a dog"], 12.3)
    logger.finish()

    text = (tmp_path / "_results_and_metrics.txt").read_text()
    assert "Learning Rate: 0.0001" in text
    assert "hello" in text and "Validation Results" in text
    assert "BLEU@4: 12.3" in text
    rec = json.loads((tmp_path / "scalars.jsonl").read_text().splitlines()[0])
    assert rec["step"] == 0 and rec["train_loss"] == 1.5


def test_wandb_channel_via_stub(tmp_path, monkeypatch):
    """With a wandb module present, RunLogger must init it, route every
    log_scalars call through run.log, and finish it."""
    calls = {"init": [], "log": [], "finish": 0}

    class FakeRun:
        def log(self, scalars, step=None):
            calls["log"].append((step, dict(scalars)))

        def finish(self):
            calls["finish"] += 1

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: (calls["init"].append(kw), FakeRun())[1]
    monkeypatch.setitem(sys.modules, "wandb", stub)

    logger = RunLogger(str(tmp_path), "wb", use_wandb=True)
    logger.log_scalars(3, {"val_loss": 0.5})
    logger.finish()

    assert calls["init"][0]["name"] == "wb"
    assert calls["log"] == [(3, {"val_loss": 0.5})]
    assert calls["finish"] == 1


def test_wandb_requested_but_unavailable_warns(tmp_path, monkeypatch):
    """A requested-but-broken wandb must warn, never silently no-op."""
    monkeypatch.setitem(sys.modules, "wandb", None)  # import raises
    with pytest.warns(UserWarning, match="wandb logging requested"):
        logger = RunLogger(str(tmp_path), "nw", use_wandb=True)
    logger.log_scalars(0, {"x": 1.0})  # still functional on file channels
    logger.finish()
