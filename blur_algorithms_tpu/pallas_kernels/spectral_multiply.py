"""Fused spectral multiply: complex spectrum x real separable kernel (Pallas).

The FFT engines multiply the r2c spectrum by the outer product of two real
1-D kernel spectra (reference ``Source.cpp:255-259``: ``resf[i,j] *=
Re(ker_row[j]) * Re(ker_col[i])``). This kernel does it in one VMEM pass,
never materializing the kernel outer product in HBM — the BASELINE.json
north-star "fused Pallas complex-multiply".

Layout: Mosaic has no complex dtype, so the complex64 spectrum is bitcast to
interleaved (re, im) float32 pairs along the minor axis — exactly the
reference's pffft "sorted" packing, whose multiply scales both halves of
each pair by the same real kernel value (``Source.cpp:414-427``). The
interleaved view keeps the lane dimension wide (2*Wf), which is what the
VPU wants; the row kernel is simply repeated 2x at trace time. An optional
``scale`` fuses the 1/N normalization like the reference fuses it into the
pffft multiply (``Source.cpp:506-507,532``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spectral_multiply_2d", "spectral_multiply_rows"]


def _kernel(flat_ref, col_ref, row2_ref, out_ref):
    # flat: (1, th, tw2) f32 interleaved re/im; col: (1, th); row2: (1, tw2)
    out_ref[0] = flat_ref[0] * (col_ref[0][:, None] * row2_ref[0][None, :])


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def spectral_multiply_2d(
    spec: jnp.ndarray,
    col_re: np.ndarray,
    row_re: np.ndarray,
    scale: float = 1.0,
    tile: tuple[int, int] = (256, 512),
) -> jnp.ndarray:
    """``spec[..., i, j] *= col_re[i] * row_re[j] * scale`` (complex64).

    ``spec``: complex64 ``(..., H, Wf)``; ``col_re``/``row_re``: float32 real
    spectra of length H / Wf. Off TPU falls back to the fused XLA expression.
    """
    h, wf = spec.shape[-2], spec.shape[-1]
    col = np.asarray(col_re, np.float32)
    row = np.asarray(row_re, np.float32)
    if jax.default_backend() != "tpu":
        return spec * (
            jnp.asarray(col[:, None] * row[None, :] * np.float32(scale))
        )

    lead = spec.shape[:-2]
    # complex64 (..., wf) -> interleaved f32 (..., 2*wf) (re0, im0, re1, ...)
    flat = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    flat = flat.reshape((-1, h, 2 * wf))
    b = flat.shape[0]

    row2 = np.repeat(row * np.float32(scale), 2)  # pffft-sorted packing
    th = min(tile[0], _ceil_to(h, 8))
    tw2 = min(2 * tile[1], _ceil_to(2 * wf, 128))
    nh, nw = -(-h // th), -(-(2 * wf) // tw2)

    flat = jnp.pad(flat, [(0, 0), (0, nh * th - h), (0, nw * tw2 - 2 * wf)])
    colp = jnp.asarray(np.pad(col, (0, nh * th - h)).reshape(1, nh * th))
    rowp = jnp.asarray(np.pad(row2, (0, nw * tw2 - 2 * wf)).reshape(1, nw * tw2))

    out = pl.pallas_call(
        _kernel,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw2), lambda c, i, j: (c, i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, th), lambda c, i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw2), lambda c, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw2), lambda c, i, j: (c, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nh * th, nw * tw2), jnp.float32),
    )(flat, colp, rowp)

    out = out[:, :h, : 2 * wf].reshape(lead + (h, wf, 2))
    return jax.lax.complex(out[..., 0], out[..., 1])


def spectral_multiply_rows(
    spec: jnp.ndarray, row_re: np.ndarray, scale: float = 1.0
) -> jnp.ndarray:
    """1-D variant for the tile path: ``spec[..., j] *= row_re[j] * scale``.

    Batches all leading dims as rows of one 2-D multiply with a unit column
    spectrum.
    """
    if spec.ndim < 2:
        return spec * (jnp.asarray(row_re, jnp.float32) * np.float32(scale))
    ones = np.ones(spec.shape[-2], dtype=np.float32)
    return spectral_multiply_2d(spec, ones, row_re, scale)
