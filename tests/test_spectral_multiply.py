"""Pallas spectral-multiply kernel (CPU fallback path + engine opt-in)."""

import jax.numpy as jnp
import numpy as np

from blur_algorithms_tpu import oracle
from blur_algorithms_tpu.ops.fft_conv import blur_fft2, blur_fft_tiles
from blur_algorithms_tpu.ops.plan import make_plan
from blur_algorithms_tpu.pallas_kernels.spectral_multiply import (
    spectral_multiply_2d,
    spectral_multiply_rows,
)


def test_2d_multiply_matches_outer_product(rng):
    spec = (rng.random((3, 20, 17)) + 1j * rng.random((3, 20, 17))).astype(
        np.complex64
    )
    col = rng.random(20).astype(np.float32)
    row = rng.random(17).astype(np.float32)
    got = np.asarray(spectral_multiply_2d(jnp.asarray(spec), col, row, scale=0.5))
    want = spec * (col[:, None] * row[None, :] * np.float32(0.5))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rows_multiply(rng):
    spec = (rng.random((4, 33)) + 1j * rng.random((4, 33))).astype(np.complex64)
    row = rng.random(33).astype(np.float32)
    got = np.asarray(spectral_multiply_rows(jnp.asarray(spec), row))
    np.testing.assert_allclose(got, spec * row, atol=1e-5)


def test_engines_with_pallas_multiply_match_oracle(rng):
    x = rng.random((3, 40, 56)).astype(np.float32) * 255
    plan = make_plan((40, 56), 5.0)
    want = oracle.blur_direct(x, plan)
    got2 = np.asarray(blur_fft2(jnp.asarray(x), plan, pallas_multiply=True))
    gott = np.asarray(blur_fft_tiles(jnp.asarray(x), plan, pallas_multiply=True))
    np.testing.assert_allclose(got2, want, atol=5e-3)
    np.testing.assert_allclose(gott, want, atol=5e-3)
