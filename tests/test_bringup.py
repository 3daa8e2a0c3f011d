"""The connected-machine bring-up recipe (scripts/bringup_real_weights.*,
docs/BRINGUP.md) must not rot while the sandbox has no network: the shell
script stays parseable, the manifest enumerates every artifact with real
URLs, and the dry-run pushes full-size fake checkpoints through the
convert stage end-to-end (VERDICT r3 missing #1/#4/#5)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def test_bringup_shell_script_parses():
    subprocess.run(["bash", "-n",
                    os.path.join(SCRIPTS, "bringup_real_weights.sh")],
                   check=True)


@pytest.mark.slow
def test_bringup_manifest_and_dryrun(tmp_path, monkeypatch):
    """--dry-run offline: writes the fetch manifest (5 artifacts, https
    URLs, provenance notes) and runs the converters clean on the fake
    full-size checkpoints (incl. the HF GitForCausalLM path)."""
    monkeypatch.setenv("ART_DIR", str(tmp_path / "artifacts"))
    env = dict(os.environ, ART_DIR=str(tmp_path / "artifacts"),
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "bringup_real_weights.py"),
         "--dry-run"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dry-run OK" in proc.stdout
    assert "0 unused, 0 unfilled" in proc.stdout

    assert "hf-teacher dry-run: converter clean" in proc.stdout
    assert ("tinyvit-parity dry-run: all 4 stages within tolerance"
            in proc.stdout)

    manifest = json.load(open(tmp_path / "artifacts" / "MANIFEST.json"))
    assert set(manifest) == {"git_large_msrvtt", "hf_git_large_msrvtt",
                             "timm_tinyvit_21m", "bert_vocab", "wordnet"}
    for entry in manifest.values():
        assert entry["url"].startswith("https://")
        assert entry["path"] and entry["note"]
        assert entry["sha256"]  # real hash or the record-at-fetch marker


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REPO, "tests", "fixtures",
                                   "real_weights")),
    reason="real-weight goldens not recorded yet (run "
           "scripts/bringup_real_weights.sh on a connected machine)")
def test_real_weight_goldens_present():
    """Once a connected machine records goldens, their files must stay
    loadable and structurally sound."""
    import numpy as np

    fx = os.path.join(REPO, "tests", "fixtures", "real_weights")
    tg = os.path.join(fx, "teacher_goldens.npz")
    if os.path.exists(tg):
        with np.load(tg) as z:
            assert z["beam_predictions"].ndim == 2
            assert np.isfinite(z["logits_fingerprint"]).all()
    pg = os.path.join(fx, "pycoco_goldens.json")
    if os.path.exists(pg):
        out = json.load(open(pg))
        assert {"meteor", "rouge_l", "cider_d"} <= set(out)
        assert len(out["meteor"]["per_pair"]) == 120
    vg = os.path.join(fx, "tinyvit_goldens.npz")
    if os.path.exists(vg):
        with np.load(vg) as z:
            assert z["student_greedy_tokens"].ndim == 2
            for s in range(4):
                assert np.isfinite(z[f"stage{s}_mean"]).all()
                assert np.isfinite(z[f"stage{s}_sample"]).all()
