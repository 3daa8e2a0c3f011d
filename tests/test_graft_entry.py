"""Driver-artifact tests: multi-chip dry run on the virtual CPU mesh."""

import importlib.util
import os

import pytest


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8(capsys):
    graft = _load_graft()
    graft.dryrun_multichip(8)  # dp=4, tp=2 over the virtual CPU mesh
    out = capsys.readouterr().out
    assert "OK" in out and "tp=2" in out


def test_dryrun_multichip_2(capsys):
    graft = _load_graft()
    graft.dryrun_multichip(2)  # dp=2, tp=1
    assert "OK" in capsys.readouterr().out
