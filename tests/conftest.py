"""Test harness: run everything on a virtual 8-device CPU mesh.

This mirrors how multi-chip code is validated without a pod slice: the same
Mesh/NamedSharding code paths execute on fake CPU devices
(xla_force_host_platform_device_count), per the build plan in SURVEY.md
sections 4 and 7 (M5).

Note: the session environment presets JAX_PLATFORMS to an experimental TPU
tunnel platform and a sitecustomize imports jax at interpreter start, so env
vars alone are too late here — we must go through jax.config.update.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
