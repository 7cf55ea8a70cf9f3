"""Fused separable-blur Pallas kernel — the flagship hot op.

One VMEM-resident pass computes both separable convolution passes per output
tile: load a uint8 (or f32) input tile plus its halo (fetched as the three
neighboring grid blocks — no overlapping-window tensor ever touches HBM,
which is what bounds the pure-XLA band-matmul engine), run the rows pass and
the columns pass as banded block matmuls on the MXU, round, and write uint8.

Replaces the reference's entire per-tile machinery (thread loops + pffft
plans + flip_block transposes + interleave rounding, ``Source.cpp:510-567``)
with a single systolic-array pipeline:

    HBM u8 tile ─DMA→ VMEM ─f32→ [X @ Bw] ─→ [Bhᵀ @ Y] ─round→ HBM u8 tile

The banded matrices ``B`` are the same truncated-kernel taps the FFT engines
use (``ops/band_matmul.band_block_matrix``), so outputs are interchangeable
with every other engine within float32 rounding.

Halo handling: the input is reflect-101 padded by the kernel radius and
zero-padded to one extra grid block per axis at trace time; each program
reads blocks (i,j), (i,j+1), (i+1,j), (i+1,j+1) through standard pipelined
BlockSpecs (the extra +1 blocks make every neighbor access in-bounds).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blur_algorithms_tpu.ops.band_matmul import band_block_matrix, blur_band_matmul
from blur_algorithms_tpu.ops.layout import round_to_u8
from blur_algorithms_tpu.ops.pad import reflect_101
from blur_algorithms_tpu.ops.plan import BlurPlan

__all__ = ["blur_fused", "blur_fused_u8"]

# Off TPU the Mosaic kernel has no hardware; tests exercise the identical
# banded-matmul math through XLA instead (set =1 to force the slow Pallas
# interpreter for kernel-logic tests).
_FORCE_INTERPRET = os.environ.get("BLUR_TPU_PALLAS_INTERPRET", "0") == "1"


def _split_bf16(v):
    """f32 -> (hi, lo) bfloat16 with hi + lo capturing ~16 mantissa bits."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(x00, x01, x10, x11, bw_mid, bw_tail, bh_mid, bh_tail, out_ref,
            *, rh: int, rw: int, th: int, tw: int, precision, out_u8: bool):
    f32 = jnp.float32
    split = precision == "bf16x3"

    def to_f32(v):
        # Mosaic has no direct u8 -> f32 cast; hop through int32.
        return v.astype(jnp.int32).astype(f32) if v.dtype == jnp.uint8 else v.astype(f32)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            precision=None if split else precision,
            preferred_element_type=f32,
        )

    # uint8-valued inputs are exact in bfloat16 (integers <= 255 fit its
    # 8-bit mantissa); float inputs need their own hi/lo split or the rows
    # pass silently drops ~8 mantissa bits.
    input_exact_in_bf16 = x00.dtype == jnp.uint8

    def rows_pass(top_ref, right_ref):
        """Rows conv of a (rows x tw+2rw) span -> (rows x tw)."""
        dims = ((1,), (0,))
        if split:
            # matrices arrive pre-split as stacked (2, K, N) bf16: [hi, lo]
            def split_dots(ref, mat_ref):
                xf = to_f32(ref)
                x_hi = xf.astype(jnp.bfloat16)
                acc = dot(x_hi, mat_ref[0], dims) + dot(x_hi, mat_ref[1], dims)
                if not input_exact_in_bf16:
                    x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    acc = acc + dot(x_lo, mat_ref[0], dims)
                return acc

            acc = split_dots(top_ref, bw_mid)
            if rw:
                acc = acc + split_dots(right_ref, bw_tail)
            return acc
        acc = dot(to_f32(top_ref), bw_mid[...], dims)
        if rw:
            acc = acc + dot(to_f32(right_ref), bw_tail[...], dims)
        return acc

    # Y1: rows-convolved strip of (th + 2rh) x tw
    y_top = rows_pass(x00[0], x01[0, :, : 2 * rw] if rw else x01[0])
    if rh:
        y_ext = rows_pass(
            x10[0, : 2 * rh, :], x11[0, : 2 * rh, : 2 * rw] if rw else x11[0]
        )

    # cols pass: out[h, w] = sum_k Bh[k, h] * Y1[k, w]
    dims_c = ((0,), (0,))
    if split:
        def col_dot(mat_ref, y):
            # y is no longer integer: split both operands, drop the lo*lo term
            y_hi, y_lo = _split_bf16(y)
            return dot(mat_ref[0], y_hi, dims_c) + dot(mat_ref[0], y_lo, dims_c) + dot(
                mat_ref[1], y_hi, dims_c
            )

        acc = col_dot(bh_mid, y_top)
        if rh:
            acc = acc + col_dot(bh_tail, y_ext)
    else:
        acc = dot(bh_mid[...], y_top, dims_c)
        if rh:
            acc = acc + dot(bh_tail[...], y_ext, dims_c)
    if out_u8:
        acc = jnp.clip(jnp.floor(acc + 0.5), 0.0, 255.0)
        acc = acc.astype(jnp.int32).astype(jnp.uint8)  # no direct f32 -> u8 cast
    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("plan", "tile", "precision", "out_u8", "pre_padded_col"),
)
def _blur_fused_planar(
    planar: jnp.ndarray,
    plan: BlurPlan,
    tile: tuple[int, int],
    precision,
    out_u8: bool,
    pre_padded_col: bool = False,
) -> jnp.ndarray:
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    th, tw = tile
    if th < 2 * rh or tw < 2 * rw:
        raise ValueError(
            f"tile {tile} smaller than halo {(2 * rh, 2 * rw)}; "
            "use a bigger tile or the band_matmul engine"
        )
    if pre_padded_col and planar.shape[-2] != h + 2 * rh:
        raise ValueError(
            f"pre_padded_col expects {h + 2 * rh} rows, got {planar.shape[-2]}"
        )

    if jax.default_backend() != "tpu" and not _FORCE_INTERPRET:
        # CPU/GPU fallback: same banded-matmul convolution via XLA, honoring
        # the requested precision (band_conv_valid understands "bf16x3" too,
        # so the accuracy class matches the TPU kernel off-device).
        from blur_algorithms_tpu.ops.band_matmul import band_conv_valid

        fb_prec = precision if precision == "bf16x3" else jax.lax.Precision.HIGHEST
        x = planar.astype(jnp.float32)
        if pre_padded_col:
            xt = jnp.moveaxis(x, -2, -1)
            x = jnp.moveaxis(
                band_conv_valid(xt, plan.col.taps, h, precision=fb_prec), -1, -2
            )
            pr = reflect_101(x, [(rw, rw)], axes=[-1])
            out = band_conv_valid(pr, plan.row.taps, w, precision=fb_prec)
        else:
            out = blur_band_matmul(x, plan, precision=fb_prec)
        return round_to_u8(out) if out_u8 else out

    lead = planar.shape[:-2]
    x = planar.reshape((-1,) + planar.shape[-2:])
    bc = x.shape[0]

    nbh, nbw = -(-h // th), -(-w // tw)
    # reflect by the radius (unless the caller provided halo rows, e.g. the
    # sharded path's ppermute exchange), then zero-fill to (nb + 1) whole
    # blocks so every neighbor block access is in-bounds.
    pads = [(0, 0), (rh, rh)] if not pre_padded_col else [(0, 0), (0, 0)]
    x = reflect_101(x, [pads[1], (rw, rw)], axes=[-2, -1])
    x = jnp.pad(
        x,
        [(0, 0), (0, (nbh + 1) * th - x.shape[-2]), (0, (nbw + 1) * tw - x.shape[-1])],
    )

    bw = band_block_matrix(plan.row.taps, tw)  # (tw + 2rw, tw)
    bh = band_block_matrix(plan.col.taps, th)  # (th + 2rh, th)
    split = precision == "bf16x3"

    def as_mat(m: np.ndarray, cols: int) -> jnp.ndarray:
        if m.shape[0] == 0:
            m = np.zeros((1, cols), np.float32)  # placeholder, unused
        if not split:
            return jnp.asarray(m)
        # pre-split hi/lo bfloat16 halves, stacked: computed once at trace
        # time instead of on the VPU in every grid step
        mj = jnp.asarray(m)
        hi = mj.astype(jnp.bfloat16)
        lo = (mj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.stack([hi, lo])

    bw_mid, bw_tail = as_mat(bw[:tw], tw), as_mat(bw[tw:], tw)
    bh_mid, bh_tail = as_mat(bh[:th], th), as_mat(bh[th:], th)

    blk = lambda di, dj: pl.BlockSpec(
        (1, th, tw),
        lambda c, i, j, di=di, dj=dj: (c, i + di, j + dj),
        memory_space=pltpu.VMEM,
    )
    mat = lambda shape: pl.BlockSpec(
        shape, (lambda c, i, j: (0,) * len(shape)), memory_space=pltpu.VMEM
    )

    interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(
            _kernel, rh=rh, rw=rw, th=th, tw=tw,
            precision=precision, out_u8=out_u8,
        ),
        interpret=interpret,
        grid=(bc, nbh, nbw),
        in_specs=[
            blk(0, 0), blk(0, 1), blk(1, 0), blk(1, 1),
            mat(bw_mid.shape), mat(bw_tail.shape),
            mat(bh_mid.shape), mat(bh_tail.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw), lambda c, i, j: (c, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bc, nbh * th, nbw * tw), jnp.uint8 if out_u8 else jnp.float32
        ),
    )(x, x, x, x, bw_mid, bw_tail, bh_mid, bh_tail)

    return out[:, :h, :w].reshape(lead + (h, w))


def _pick_tile(plan: BlurPlan) -> tuple[int, int]:
    def side(radius: int, dim: int, lane: bool) -> int:
        halo_min_unit = 128 if lane else 8
        halo_min = halo_min_unit * ((2 * radius + halo_min_unit - 1) // halo_min_unit)
        halo_min = max(halo_min, halo_min_unit)
        if not lane and halo_min <= 256 <= dim:
            # sublane dim may be any multiple of 8: prefer a tile that divides
            # the axis exactly (zero padding waste, e.g. 240 for 2160 rows)
            for t in range(256, max(halo_min, 128) - 1, -8):
                if dim % t == 0:
                    return t
        pref = max(256, halo_min)
        dim_rounded = max(128, 128 * ((dim + 127) // 128))
        # shrink toward the image size but never below the halo
        return max(halo_min, min(pref, dim_rounded), halo_min_unit * 2)

    return (
        side(plan.col.support_radius, plan.shape[0], lane=False),
        side(plan.row.support_radius, plan.shape[1], lane=True),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _blur_fused_diff(planar, plan, precision, tile):
    return _blur_fused_planar(planar, plan, tile, precision, out_u8=False)


def _blur_fused_fwd(planar, plan, precision, tile):
    return _blur_fused_diff(planar, plan, precision, tile), None


def _blur_fused_bwd(plan, precision, tile, _res, ct):
    # blur is linear: VJP = the adjoint operator (ops/adjoint.py), which
    # folds reflect-pad cotangents and reuses the banded MXU path
    from blur_algorithms_tpu.ops.adjoint import blur_adjoint

    return (blur_adjoint(ct, plan),)


_blur_fused_diff.defvjp(_blur_fused_fwd, _blur_fused_bwd)


def blur_fused(
    planar: jnp.ndarray,
    plan: BlurPlan,
    precision=jax.lax.Precision.HIGHEST,
    tile: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Fused-tile separable blur of planar data ``(..., H, W)`` -> float32.

    Accepts uint8 or float input (converted in VMEM). Differentiable for
    float inputs via an explicit adjoint ``custom_vjp`` (Pallas kernels have
    no automatic transpose).
    """
    tile = tile or _pick_tile(plan)
    if jnp.issubdtype(jnp.asarray(planar).dtype, jnp.floating):
        return _blur_fused_diff(planar, plan, precision, tile)
    return _blur_fused_planar(planar, plan, tile, precision, out_u8=False)


def blur_fused_u8(
    planar_u8: jnp.ndarray,
    plan: BlurPlan,
    precision=jax.lax.Precision.HIGHEST,
    tile: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Fused-tile blur, uint8 planar in -> uint8 planar out (rounds in VMEM)."""
    tile = tile or _pick_tile(plan)
    return _blur_fused_planar(planar_u8, plan, tile, precision, out_u8=True)


def blur_fused_haloed(
    planar: jnp.ndarray,
    plan: BlurPlan,
    precision="bf16x3",
    tile: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Fused blur whose row axis carries pre-supplied halo context.

    Input ``(..., H + 2*rh, W)`` where the extra ``rh`` rows on each side
    came from somewhere else (another device's shard via ``ppermute``, a
    previous pipeline stage); output ``(..., H, W)`` float32. The column
    (W) borders still reflect locally. This is the per-shard compute step
    of the multi-chip path (``parallel/sharded.py``).
    """
    tile = tile or _pick_tile(plan)
    return _blur_fused_planar(
        planar, plan, tile, precision, out_u8=False, pre_padded_col=True
    )
