"""Planar <-> interleaved layout with the reference's exact uint8 rounding.

Reference ``deinterleave_BGR``/``interleave_BGR`` (``Utils.hpp:159-210``)
split interleaved uint8 pixels into planar float arrays and merge them back,
adding ``+0.5`` exactly when converting float -> integral (round-half-up via
C truncation, ``Utils.hpp:163,189``). The reference's cache-block tiling and
``hybrid_loop`` threading vanish here: XLA's layout assignment owns the data
movement, and the whole conversion is one fused transpose+cast.

Values outside [0, 255] are clipped; the reference's raw C cast is undefined
for them (in practice the blur output only strays below 0/above 255 by FFT
rounding noise, where the clip matches a saturating cast).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["to_planar", "from_planar", "round_to_u8"]


def to_planar(interleaved: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(..., H, W, C) interleaved -> (..., C, H, W) planar, cast to ``dtype``."""
    return jnp.moveaxis(interleaved, -1, -3).astype(dtype)


def round_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """float -> uint8 with the reference's +0.5 truncation (round-half-up)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0).astype(jnp.uint8)


def from_planar(planar: jnp.ndarray, dtype=jnp.uint8) -> jnp.ndarray:
    """(..., C, H, W) planar -> (..., H, W, C) interleaved.

    Integral targets get the +0.5 round-half-up of ``Utils.hpp:189,204-206``.
    """
    interleaved = jnp.moveaxis(planar, -3, -1)
    if dtype == jnp.uint8:
        return round_to_u8(interleaved)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        # same +0.5 truncation and range clip for every integral target.
        # Clip bounds must be float32-representable values INSIDE the
        # target range: float32(2^31 - 1) rounds up to 2^31, which would
        # let a clipped value overflow the cast (int32/int64 targets).
        info = jnp.iinfo(jnp.dtype(dtype))
        # compare in float64: float32(2^31 - 1) == 2^31 and NumPy's weak
        # promotion would round info.max the same way before comparing
        hi = np.float32(info.max)
        if float(hi) > info.max:
            hi = np.nextafter(hi, np.float32(0))
        lo = np.float32(info.min)
        if float(lo) < info.min:
            lo = np.nextafter(lo, np.float32(0))
        return jnp.clip(
            jnp.floor(interleaved + 0.5), float(lo), float(hi)
        ).astype(dtype)
    return interleaved.astype(dtype)
