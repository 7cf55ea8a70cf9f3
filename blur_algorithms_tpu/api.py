"""Public API: one-call blurs with jit caching per static configuration.

The reference's engine dispatcher ``Test`` (``Source.cpp:574-608``) maps CLI
flags to engines; that enum survives here as :class:`Engine` plus
``FLAG_TO_ENGINE`` for CLI parity:

==== ======================== =============================
flag reference engine          TPU engine
==== ======================== =============================
5    pocketfft_1D tiles        ``fft_tiles``
4    FastBoxBlur               ``box``
3    pffft 1-D tiles           ``fft_tiles``
2    pocketfft_2D              ``fft2``
1    cv::GaussianBlur baseline ``conv`` (direct MXU path)
==== ======================== =============================

Every (shape, nsmooth, engine, options) tuple is a distinct jit
specialization, cached process-wide; the compiled program fuses
deinterleave -> blur -> interleave in one dispatch.
"""

from __future__ import annotations

import enum
import functools
from typing import Any

import jax
import jax.numpy as jnp

from blur_algorithms_tpu.ops import box_blur as _box
from blur_algorithms_tpu.ops import direct_conv, fft_conv, layout, spectrum
from blur_algorithms_tpu.ops.plan import make_plan

__all__ = [
    "Engine",
    "FLAG_TO_ENGINE",
    "blur",
    "blur_u8",
    "gaussian_blur",
    "box_blur",
    "dft_spectrum",
]


class Engine(str, enum.Enum):
    FFT2 = "fft2"
    FFT_TILES = "fft_tiles"
    CONV = "conv"
    BOX = "box"
    AUTO = "auto"


FLAG_TO_ENGINE = {
    5: Engine.FFT_TILES,
    4: Engine.BOX,
    3: Engine.FFT_TILES,
    2: Engine.FFT2,
    1: Engine.CONV,
}

# Above this kernel width the O(N log N) FFT path beats direct convolution.
_AUTO_CONV_MAX_WIDTH = 192


def _resolve_engine(engine: Engine | str, width: int) -> Engine:
    engine = Engine(engine)
    if engine is Engine.AUTO:
        return Engine.CONV if width <= _AUTO_CONV_MAX_WIDTH else Engine.FFT_TILES
    return engine


def _blur_planar(x: jnp.ndarray, plan, engine: Engine) -> jnp.ndarray:
    if engine is Engine.FFT2:
        return fft_conv.blur_fft2(x, plan)
    if engine is Engine.FFT_TILES:
        return fft_conv.blur_fft_tiles(x, plan)
    if engine is Engine.CONV:
        return direct_conv.blur_conv(x, plan)
    raise ValueError(f"engine {engine} is not a planar FFT/conv engine")


@functools.lru_cache(maxsize=256)
def _compiled_planar(
    shape: tuple[int, ...],
    dtype: Any,
    nsmooth: float,
    engine: Engine,
    kernel: str,
    size_mode: str,
) -> Any:
    h, w = shape[-2], shape[-1]
    if engine is Engine.BOX:
        radius = int(float(nsmooth) * float(nsmooth))

        def fn(x):
            return _box.box_blur_planar(x.astype(jnp.float32), radius, passes=2)

        return jax.jit(fn)

    plan = make_plan((h, w), nsmooth, kernel=kernel, size_mode=size_mode)
    eng = _resolve_engine(engine, max(plan.row.width, plan.col.width))

    def fn(x):
        return _blur_planar(x.astype(jnp.float32), plan, eng)

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def _compiled_u8(
    shape: tuple[int, ...],
    nsmooth: float,
    engine: Engine,
    kernel: str,
    size_mode: str,
) -> Any:
    h, w = shape[-3], shape[-2]
    if engine is Engine.BOX:
        radius = int(float(nsmooth) * float(nsmooth))

        def fn(img):
            planar = layout.to_planar(img)
            return layout.from_planar(_box.box_blur_planar(planar, radius, passes=2))

        return jax.jit(fn)

    plan = make_plan((h, w), nsmooth, kernel=kernel, size_mode=size_mode)
    eng = _resolve_engine(engine, max(plan.row.width, plan.col.width))

    def fn(img):
        planar = layout.to_planar(img)
        return layout.from_planar(_blur_planar(planar, plan, eng))

    return jax.jit(fn)


def blur(
    planar: jnp.ndarray,
    nsmooth: float,
    engine: Engine | str = Engine.AUTO,
    kernel: str = "gaussian",
    size_mode: str = "smooth235",
) -> jnp.ndarray:
    """Blur float planar data ``(..., H, W)``; returns float32.

    ``nsmooth`` is sigma for ``kernel="gaussian"``; for ``engine="box"`` it
    follows the reference call site (radius = nsmooth^2, 2 passes,
    ``Source.cpp:587``).
    """
    fn = _compiled_planar(
        tuple(planar.shape),
        jnp.asarray(planar).dtype,
        float(nsmooth),
        Engine(engine),
        kernel,
        size_mode,
    )
    return fn(planar)


def blur_u8(
    img: jnp.ndarray,
    nsmooth: float,
    engine: Engine | str = Engine.AUTO,
    kernel: str = "gaussian",
    size_mode: str = "smooth235",
) -> jnp.ndarray:
    """Blur interleaved uint8 ``(..., H, W, C)``; returns uint8.

    The full reference pipeline (deinterleave -> blur -> +0.5 interleave,
    ``Source.cpp:459-567``) as one fused jit program.
    """
    img = jnp.asarray(img)
    if img.dtype != jnp.uint8:
        raise TypeError(f"blur_u8 expects uint8, got {img.dtype}")
    if img.ndim < 3:
        raise ValueError("blur_u8 expects (..., H, W, C)")
    fn = _compiled_u8(
        tuple(img.shape), float(nsmooth), Engine(engine), kernel, size_mode
    )
    return fn(img)


def gaussian_blur(img: jnp.ndarray, sigma: float, **kwargs) -> jnp.ndarray:
    """True Gaussian blur; uint8 interleaved or float planar, auto-detected."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        return blur_u8(img, sigma, **kwargs)
    return blur(img, sigma, **kwargs)


def box_blur(img: jnp.ndarray, nsmooth: float, passes: int = 2) -> jnp.ndarray:
    """FastBoxBlur-parity box blur: radius = nsmooth^2, default 2 passes."""
    img = jnp.asarray(img)
    radius = int(float(nsmooth) * float(nsmooth))
    if img.dtype == jnp.uint8:

        @functools.partial(jax.jit, static_argnums=(1, 2))
        def fn(x, r, p):
            planar = layout.to_planar(x)
            return layout.from_planar(_box.box_blur_planar(planar, r, passes=p))

        return fn(img, radius, int(passes))
    return _box.box_blur_planar(img.astype(jnp.float32), radius, passes=int(passes))


def dft_spectrum(
    img: jnp.ndarray, nsmooth: float = 1.0, size_mode: str = "smooth235"
) -> jnp.ndarray:
    """``DFT_image`` mode: log-magnitude spectrum of each channel.

    Accepts uint8 ``(..., H, W, C)`` or float planar ``(..., H, W)``; pads
    exactly like the fft2 blur at the same ``nsmooth`` (the reference reuses
    the blur geometry, ``Source.cpp:240-252``).
    """
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        planar = layout.to_planar(img)
    else:
        planar = img.astype(jnp.float32)
    plan = make_plan(planar.shape[-2:], nsmooth, size_mode=size_mode)
    return jax.jit(lambda x: spectrum.dft_spectrum_planar(x, plan))(planar)
