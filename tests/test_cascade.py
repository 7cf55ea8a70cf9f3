"""Cascade engine: semigroup decomposition accuracy and step selection."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from blur_algorithms_tpu import Engine, blur_u8, oracle
from blur_algorithms_tpu.ops.cascade import blur_cascade, cascade_sigmas


def test_sigma_split_preserves_variance():
    for sigma in [10.0, 100.0, 155.0, 400.0]:
        steps = cascade_sigmas(sigma)
        total = math.sqrt(sum(s * s for s in steps))
        assert abs(total - sigma) < 1e-9
        assert all(s <= 70 for s in steps) or len(steps) == 1


def test_small_sigma_single_step():
    assert len(cascade_sigmas(10.0)) == 1
    assert len(cascade_sigmas(155.0)) >= 4


def test_cascade_close_to_exact_blur(rng):
    # sigma large enough to need 2+ steps on a small image: per-axis clamps
    # kick in for both paths, so compare against the exact oracle loosely
    x = rng.random((300, 280)).astype(np.float32) * 255
    sigma = 80.0
    assert len(cascade_sigmas(sigma)) >= 2
    got = np.asarray(blur_cascade(jnp.asarray(x), sigma))
    from blur_algorithms_tpu.ops.plan import make_plan

    want = oracle.blur_direct(x, make_plan((300, 280), sigma))
    # approximation: a few counts of deviation allowed, structure preserved
    assert np.abs(got - want).max() < 4.0
    assert np.abs(got - want).mean() < 1.0


def test_cascade_u8_api(rng):
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    out = np.asarray(blur_u8(jnp.asarray(img), 90.0, engine=Engine.CASCADE))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out.std() < img.std() / 2


def test_too_large_sigma_raises():
    with pytest.raises(ValueError):
        cascade_sigmas(1e6)
