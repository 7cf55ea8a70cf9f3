"""Fast box blur — the FastBoxBlur capability, TPU-native.

The reference delegates to the author's ``FastBoxBlur`` submodule
(``Source.cpp:587``): a sliding-accumulator horizontal box blur
(``out[i+1] = out[i] + in[i+r+1] - in[i-r]``), reflect borders, a cache
-blocked transpose between passes, run twice (``passes=2``) to approximate a
Gaussian with a tent. The sliding accumulator is an inherently *sequential*
recurrence — the CPU-optimal form. The TPU-native equivalent of the same
O(N) math is the **cumulative-sum difference**: with ``cs`` the exclusive
cumsum of the reflect-101-padded axis,
``box[i] = (cs[i + 2r + 1] - cs[i]) / (2r + 1)`` — a parallel scan XLA maps
to the VPU, replacing the data-dependent loop. A Pallas sliding-window
variant lives in ``blur_algorithms_tpu.pallas_kernels.box_blur_pallas``.

Accumulation is float32 across passes with a single final rounding
(the submodule is vendored empty in the reference snapshot; semantics
reconstructed from its call site and README — SURVEY.md §2 #21).

Call-site parity: the reference passes ``radius = nsmooth^2`` and
``passes = 2`` (``Source.cpp:587``).
"""

from __future__ import annotations

import jax.numpy as jnp

from blur_algorithms_tpu.ops.pad import reflect_101

__all__ = ["box_blur_planar", "box_blur_axis"]


def box_blur_axis(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """One box pass of width ``2*radius + 1`` along ``axis`` (reflect-101)."""
    if radius <= 0:
        return x
    n = x.shape[axis]
    r = min(radius, n - 1)  # clamp like Reflect_101 (Utils.hpp:217-220)
    width = 2 * r + 1
    x = jnp.moveaxis(x, axis, -1)
    padded = reflect_101(x, [(r, r)])
    cs = jnp.cumsum(padded, axis=-1, dtype=jnp.float32)
    zero = jnp.zeros(cs.shape[:-1] + (1,), cs.dtype)
    cs = jnp.concatenate([zero, cs], axis=-1)  # exclusive prefix sum
    out = (cs[..., width : width + n] - cs[..., 0:n]) * (1.0 / width)
    return jnp.moveaxis(out, -1, axis)


def box_blur_planar(planar: jnp.ndarray, radius: int, passes: int = 2) -> jnp.ndarray:
    """``passes`` x (rows box + cols box) on float32 planar ``(..., H, W)``."""
    out = planar
    for _ in range(max(1, int(passes))):
        out = box_blur_axis(out, radius, -1)
        out = box_blur_axis(out, radius, -2)
    return out
