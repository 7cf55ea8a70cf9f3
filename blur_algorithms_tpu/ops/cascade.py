"""Cascade engine: huge-sigma Gaussian as k composed MXU-sized blurs.

Gaussian blurs form a semigroup: blurring with sigma_1 then sigma_2 equals
one blur with sqrt(sigma_1^2 + sigma_2^2). A sigma too large for the fused
VMEM tile (support radius > ~256) therefore decomposes into ``k`` identical
steps of ``sigma / sqrt(k)``, each running on the fused Pallas engine —
O(k * r/sqrt(k)) work instead of the FFT path's O(log N) but with the MXU's
throughput, which wins by a wide margin in practice.

This is an *approximation* relative to the reference's single truncated
kernel: truncated+renormalized Gaussians compose only approximately (each
step clips its tails at the reference's own 1/255 threshold). Measured
deviation stays within a few uint8 counts; the parity engines (fft*/band)
remain the bit-accurate paths, so ``auto`` never picks cascade — it is an
explicit opt-in for throughput at extreme sigma.
"""

from __future__ import annotations

import functools
import math

from blur_algorithms_tpu.ops import kernels
from blur_algorithms_tpu.ops.plan import make_plan

__all__ = ["cascade_sigmas", "blur_cascade"]

# keep each step's support radius inside the fused engine's comfort zone
_STEP_MAX_RADIUS = 224


def _radius_for(sigma: float) -> int:
    return (kernels.gaussian_window(sigma) - 1) // 2


def cascade_sigmas(sigma: float) -> list[float]:
    """Split ``sigma`` into k equal steps with per-step radius <= ~224."""
    k = 1
    while _radius_for(sigma / math.sqrt(k)) > _STEP_MAX_RADIUS:
        k += 1
        if k > 64:
            raise ValueError(f"sigma {sigma} too large to cascade")
    return [sigma / math.sqrt(k)] * k


@functools.lru_cache(maxsize=64)
def _cascade_plans(shape: tuple[int, int], sigma: float, size_mode: str):
    return tuple(
        make_plan(shape, s, kernel="gaussian", size_mode=size_mode)
        for s in cascade_sigmas(sigma)
    )


def blur_cascade(planar, sigma: float, size_mode: str = "smooth235"):
    """Cascaded fused blur of float planar ``(..., H, W)`` (or uint8 in)."""
    from blur_algorithms_tpu.pallas_kernels.fused_blur import blur_fused

    h, w = planar.shape[-2], planar.shape[-1]
    out = planar
    for plan in _cascade_plans((h, w), float(sigma), size_mode):
        out = blur_fused(out, plan, precision="bf16x3")
    return out


def blur_cascade_u8(planar_u8, sigma: float, size_mode: str = "smooth235"):
    """uint8 planar in/out: intermediate steps stay float32, one rounding."""
    from blur_algorithms_tpu.ops.layout import round_to_u8

    return round_to_u8(blur_cascade(planar_u8, sigma, size_mode))
