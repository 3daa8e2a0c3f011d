"""Test harness: force an 8-device virtual CPU platform before jax imports.

This is the TPU-native way to test multi-chip sharding without a pod
(SURVEY.md §4): every test sees jax.device_count() == 8 on CPU, so mesh /
shard_map / NamedSharding paths compile and execute the same collectives
they would over ICI.
"""

import os

# NOTE: the sandbox exports JAX_PLATFORMS=axon (the TPU tunnel) and the axon
# plugin wins the backend election even when the env var asks for cpu, so the
# platform is forced through jax.config below (which does take effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # conftest initializes jax BEFORE rtvc_tpu's _cap_cpu_isa can run, so
    # apply the AVX2 cap here too — without it XLA:CPU AOT cache entries
    # carry +prefer-no-scatter/gather tuning pseudo-features that never
    # match host CPUID, spamming "could lead to SIGILL" errors on reload
    # (rtvc_tpu/__init__.py has the full story)
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(5)
