"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on 8 virtual CPU devices (the analogue of the
reference's 2-GPU-in-one-process SyncBN tests — SURVEY.md §4); TPU perf is
measured separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
