"""Test harness: force an 8-device virtual CPU platform before jax imports.

This is the TPU-native way to test multi-chip sharding without a pod
(SURVEY.md §4): every test sees jax.device_count() == 8 on CPU, so mesh /
shard_map / NamedSharding paths compile and execute the same collectives
they would over ICI.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(5)
