"""Pallas box blur: in-VMEM prefix-sum sliding windows, O(1)/pixel in radius.

The reference's FastBoxBlur is a sequential sliding accumulator
(``out[i+1] = out[i] + in[i+r+1] - in[i-r]``) — CPU-optimal, useless on a
vector machine. The TPU-native form of the same O(N) math: an inclusive
prefix sum and a shifted difference, entirely VMEM-resident per tile. The
scan itself runs as chunked (128, 128) upper-triangular matmuls on the MXU
with a tiny sequential carry — ~n/128 small dots compile flat in the axis
length where the earlier Hillis-Steele roll unroll took Mosaic ~39 s at
14 MP, and the dots run ~2x faster than the VPU roll cascade (4K 2-pass
2-D: 2.4 ms at r=16, 7.9 ms at r=1200). Cost per pixel is independent of
the radius, so this engine owns the large-radius regime where the
banded-matmul engine's O(r) MXU work stops paying.

All ``passes`` of one axis run inside a single kernel invocation (box passes
commute across axes, and sequential reflect-101 passes equal one wider-pad
pass — see ``ops/kernels.box_passes_kernel``); the input is pre-padded by
``passes * r`` per side with XLA's reflect pad.

Plain ``jnp.cumsum`` on TPU measured 2.6 s for one 4K frame (it materializes
every scan step in HBM); this kernel does the same blur in ~1 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blur_algorithms_tpu.ops.layout import round_to_u8
from blur_algorithms_tpu.ops.pad import reflect_101

__all__ = ["box_blur_pallas", "box_blur_pallas_axis", "box_blur_pallas_u8"]


def _inclusive_scan_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last axis, in-VMEM, MXU-chunked.

    Each 128-lane chunk scans via one (th, 128) @ (128, 128) upper-triangular
    matmul (MXU), with a tiny sequential carry between chunks. Compile cost is
    ~n/128 small dots — flat-ish in n — where the previous Hillis-Steele form
    (log2(n) unrolled ``pltpu.roll`` steps over the full (th, n) block) took
    Mosaic ~39 s at 14 MP. HIGHEST keeps the dots f32-exact for pass-2 data
    (pass-1 integer data is exact at any precision).
    """
    n = x.shape[-1]
    f32 = x.dtype
    row_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (row_i <= col_i).astype(f32)  # x @ tri = within-chunk inclusive scan
    nc = -(-n // 128)
    chunks = []
    carry = jnp.zeros(x.shape[:-1] + (1,), f32)
    for c in range(nc):
        lo = c * 128
        width = min(n - lo, 128)
        xc = jax.lax.slice_in_dim(x, lo, lo + width, axis=-1)
        t = tri if width == 128 else tri[:width, :width]
        csc = (
            jax.lax.dot_general(
                xc,
                t,
                (((x.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32,
            )
            + carry
        )
        chunks.append(csc)
        carry = jax.lax.slice_in_dim(csc, width - 1, width, axis=-1)
    return chunks[0] if nc == 1 else jnp.concatenate(chunks, axis=-1)


def _window_mean_last(x: jnp.ndarray, r: int, m: int) -> jnp.ndarray:
    """Sliding mean of width ``2r + 1``: first ``m`` valid windows of ``x``."""
    w = 2 * r + 1
    cs = _inclusive_scan_last(x)
    hi = cs[..., w - 1 : w - 1 + m]
    lo = jnp.concatenate(
        [jnp.zeros(cs.shape[:-1] + (1,), cs.dtype), cs[..., : m - 1]], axis=-1
    )
    return (hi - lo) * (1.0 / w)


def _kernel(x_ref, out_ref, *, r: int, passes: int, n: int, out_u8: bool):
    x = x_ref[0]
    # uint8 input converts in VMEM (Mosaic has no direct u8 -> f32 cast)
    x = (
        x.astype(jnp.int32).astype(jnp.float32)
        if x.dtype == jnp.uint8
        else x.astype(jnp.float32)
    )
    length = x.shape[-1]  # n + 2 * passes * r; shrinks by 2r per pass
    for _ in range(passes):
        x = _window_mean_last(x, r, length - 2 * r)
        length -= 2 * r
    x = x[..., :n]
    if out_u8:
        # reference +0.5 rounding in VMEM (no direct f32 -> u8 cast)
        x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
        x = x.astype(jnp.int32).astype(jnp.uint8)
    out_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("r", "passes", "tile_rows", "out_u8")
)
def box_blur_pallas_axis(
    planar: jnp.ndarray,
    r: int,
    passes: int = 2,
    tile_rows: int = 128,
    out_u8: bool = False,
) -> jnp.ndarray:
    """Box blur along the last axis of ``(..., M, N)``; ``passes`` x.

    Accepts float32 or uint8 input (uint8 converts in VMEM — no full-frame
    f32 copy ever reaches HBM); ``out_u8`` rounds in VMEM and writes uint8.
    """
    out_dtype = jnp.uint8 if out_u8 else jnp.float32
    is_u8_in = planar.dtype == jnp.uint8

    def passthrough(x):
        if out_u8:
            return round_to_u8(x) if not is_u8_in else x
        return x.astype(jnp.float32)

    if r <= 0:
        return passthrough(planar)
    n = planar.shape[-1]
    pad = min(passes * r, n - 1) if n > 1 else 0
    eff_r = pad // passes  # keep each pass's window inside the padded span
    if eff_r == 0:
        return passthrough(planar)

    lead = planar.shape[:-2]
    x = planar.reshape((-1,) + planar.shape[-2:])
    if not is_u8_in:
        x = x.astype(jnp.float32)
    x = reflect_101(x, [(passes * eff_r, passes * eff_r)], axes=[-1])

    if jax.default_backend() != "tpu":
        # XLA fallback: same scan-difference math
        x = x.astype(jnp.float32)
        length = x.shape[-1]
        for _ in range(passes):
            cs = jnp.cumsum(x, axis=-1)
            m = length - 2 * eff_r
            w = 2 * eff_r + 1
            hi = cs[..., w - 1 : w - 1 + m]
            lo = jnp.concatenate(
                [jnp.zeros(cs.shape[:-1] + (1,), cs.dtype), cs[..., : m - 1]],
                axis=-1,
            )
            x = (hi - lo) * (1.0 / w)
            length = m
        out = x[..., :n].reshape(lead + planar.shape[-2:])
        return round_to_u8(out) if out_u8 else out

    # lane-align the scan axis so every 128-chunk slice is full-width;
    # trailing zeros are inert (they only extend the prefix sum's tail)
    length0 = x.shape[-1]
    aligned = -(-length0 // 128) * 128
    if aligned != length0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, aligned - length0)])

    bc, mrows, length = x.shape
    # VMEM bound: in-block + scan temporaries + out-block ~ 3 * th * L * 4B;
    # shrink the row tile for very long axes (e.g. 24000-px scans)
    budget_rows = max(8, (6 * 1024 * 1024) // (3 * 4 * max(length, 1)) // 8 * 8)
    th = min(tile_rows, budget_rows, -(-mrows // 8) * 8)
    nth = -(-mrows // th)
    x = jnp.pad(x, [(0, 0), (0, nth * th - mrows), (0, 0)])

    out = pl.pallas_call(
        functools.partial(_kernel, r=eff_r, passes=passes, n=n, out_u8=out_u8),
        grid=(bc, nth),
        in_specs=[
            pl.BlockSpec(
                (1, th, length), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, th, n), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bc, nth * th, n), out_dtype),
    )(x)

    return out[:, :mrows, :].reshape(lead + planar.shape[-2:])


def _box_blur_2d(planar: jnp.ndarray, radius: int, passes: int) -> jnp.ndarray:
    out = box_blur_pallas_axis(planar, radius, passes)
    out = jnp.swapaxes(
        box_blur_pallas_axis(jnp.swapaxes(out, -1, -2), radius, passes), -1, -2
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _box_blur_diff(planar, radius, passes):
    return _box_blur_2d(planar, radius, passes)


def _box_blur_fwd(planar, radius, passes):
    return _box_blur_diff(planar, radius, passes), None


def _box_blur_bwd(radius, passes, _res, ct):
    # the scan-difference pipeline equals one pass of the folded
    # box_passes_kernel taps with reflect-101 borders (same per-axis radius
    # clamp: min(passes*r, dim-1) // passes both here and in make_plan), so
    # the VJP is the standard blur adjoint of that plan
    from blur_algorithms_tpu.ops.adjoint import blur_adjoint
    from blur_algorithms_tpu.ops.plan import make_plan

    plan = make_plan(
        (ct.shape[-2], ct.shape[-1]), radius, kernel="box_fast",
        box_passes=passes,
    )
    return (blur_adjoint(ct, plan),)


_box_blur_diff.defvjp(_box_blur_fwd, _box_blur_bwd)


def box_blur_pallas(
    planar: jnp.ndarray, radius: int, passes: int = 2
) -> jnp.ndarray:
    """FastBoxBlur semantics on float32 planar ``(..., H, W)``.

    ``passes`` box passes per axis (rows then columns), each width
    ``2*radius + 1``, reflect-101 borders. Differentiable: the pipeline is
    linear and ships an explicit adjoint ``custom_vjp`` (Pallas kernels
    have no automatic transpose).
    """
    return _box_blur_diff(planar, int(radius), int(passes))


def box_blur_pallas_u8(
    planar_u8: jnp.ndarray, radius: int, passes: int = 2
) -> jnp.ndarray:
    """uint8 planar ``(..., H, W)`` in -> uint8 out, scan kernel end to end.

    Mirrors ``blur_fused_u8``: the rows pass converts uint8 in VMEM and the
    columns pass rounds back to uint8 in VMEM, so only ONE full-frame f32
    intermediate (between the passes) ever exists in HBM — the generic
    ``to_planar``/``from_planar`` route materializes two more.
    """
    out = box_blur_pallas_axis(planar_u8, int(radius), int(passes))
    out = jnp.swapaxes(
        box_blur_pallas_axis(
            jnp.swapaxes(out, -1, -2), int(radius), int(passes), out_u8=True
        ),
        -1,
        -2,
    )
    return out
