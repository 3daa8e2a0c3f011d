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


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    graft = _load_graft()
    graft.dryrun_multichip(8)  # dp=4, tp=2 over the virtual CPU mesh
    out = capsys.readouterr().out
    assert "OK" in out and "tp=2" in out


@pytest.mark.slow
def test_dryrun_multichip_2(capsys):
    graft = _load_graft()
    graft.dryrun_multichip(2)  # dp=2, tp=1
    assert "OK" in capsys.readouterr().out


@pytest.mark.slow
def test_dryrun_is_hermetic_never_initializes_tpu_client():
    """Round-1 driver failure: the dryrun placed data on the default (TPU)
    backend and died on a libtpu client/terminal version skew. The fix must
    guarantee the TPU client is NEVER INITIALIZED when the dryrun runs in a
    fresh process — then no TPU env flake can reach it."""
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent("""
        import os, sys
        sys.path.insert(0, %r)
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(%r, "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
        from jax._src import xla_bridge
        inited = list(xla_bridge._backends)
        assert all(b == "cpu" for b in inited), f"non-cpu backend: {inited}"
        print("HERMETIC", inited)
    """ % (repo, repo))
    env = dict(os.environ)
    # The sandbox default: TPU plugin selected. A broken plugin must not
    # matter because the dryrun flips to cpu before any backend init.
    env["JAX_PLATFORMS"] = "axon"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "HERMETIC" in r.stdout and "OK" in r.stdout
