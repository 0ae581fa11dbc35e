"""Robust TPU-backend detection.

The auto mode of every kernel flag ("None = on for TPU") used to test
``jax.default_backend() == "tpu"``.  That is wrong under PJRT plugins that
register the TPU under a different platform name (e.g. a tunneled/relayed
plugin whose backend is named after the transport): the real device is a
TPU — MXU matmuls and Pallas kernels work — but the platform string is not
``"tpu"``, so every kernel silently fell back to the XLA reference path in
benchmarks.  Detect the hardware from the device descriptors instead, and
accept any of platform, platform_version, or device_kind naming a TPU.
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def is_tpu_backend() -> bool:
    """True when the default JAX backend executes on TPU hardware."""
    if jax.default_backend() == "tpu":
        return True
    try:
        dev = jax.devices()[0]
    except Exception:  # backend failed to initialize
        return False
    probes = (
        getattr(dev, "platform", "") or "",
        getattr(dev, "device_kind", "") or "",
        getattr(dev, "platform_version", "") or "",
    )
    return any("tpu" in p.lower() for p in probes)
