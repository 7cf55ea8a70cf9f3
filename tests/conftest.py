"""Test env: CPU backend with 8 virtual devices (sharding tests run here).

Must run before jax initializes its backends, hence env vars at import time.
The real-TPU path is exercised by bench.py / __graft_entry__.py instead.
"""

import os

# Force-assign: the container exports JAX_PLATFORMS=axon (the real-TPU
# tunnel) and its sitecustomize imports jax at interpreter startup, so the
# env var alone is read too late — set the config explicitly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def rgb_image(rng):
    """Deterministic 96x80 uint8 RGB test image with structure."""
    h, w = 96, 80
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        127
        + 80 * np.sin(xx / 7.0)
        + 60 * np.cos(yy / 11.0)
        + rng.normal(0, 20, (h, w))
    )
    img = np.stack(
        [base, np.roll(base, 13, axis=0), np.roll(base, 7, axis=1)], axis=-1
    )
    return np.clip(img, 0, 255).astype(np.uint8)
