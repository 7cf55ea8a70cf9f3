"""Reflect-101 border padding as static XLA pad ops.

Reference: ``Reflect_101`` (``Utils.hpp:212-243``) pads like OpenCV's
``BORDER_REFLECT_101`` (the edge pixel is not duplicated:
``g f e d c b | A B C D E F G | f e d c b a``, ``README.md:47-53``), with
every pad clamped to ``dim - 1`` to prevent out-of-buffer reads
(``Utils.hpp:217-220``).

Here the pad is a trace-time-shaped ``jnp.pad(mode="reflect")`` — JAX's
"reflect" mode is reflect-101 — baked into the compiled program. The
``dim - 1`` clamp is replicated; any residual request beyond the clamp is
filled with zeros (the reference's 2-D path leaves that region
uninitialized — a latent bug at extreme sigma; zeros are the tile path's
documented trailing-fill semantics, ``Source.cpp:297-306``, and the region
is never read back by interior outputs).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["reflect_101", "clamp_pad"]


def clamp_pad(pad: int, dim: int) -> int:
    """Clamp a one-side pad to ``dim - 1`` (reference ``Utils.hpp:217-220``)."""
    return max(0, min(int(pad), int(dim) - 1))


def reflect_101(
    x: jnp.ndarray,
    pads: Sequence[tuple[int, int]],
    axes: Sequence[int] | None = None,
) -> jnp.ndarray:
    """Pad ``x`` with reflect-101 borders, clamped per side to ``dim - 1``.

    ``pads[k] = (before, after)`` applies to ``axes[k]`` (defaults to the
    last ``len(pads)`` axes). Requests exceeding the clamp are completed
    with zeros so the output shape always honors the request.
    """
    if axes is None:
        axes = range(x.ndim - len(pads), x.ndim)
    axes = [a % x.ndim for a in axes]
    if len(axes) != len(pads):
        raise ValueError("pads and axes length mismatch")

    reflect_cfg = [(0, 0)] * x.ndim
    zero_cfg = [(0, 0)] * x.ndim
    need_zero = False
    for axis, (before, after) in zip(axes, pads):
        dim = x.shape[axis]
        rb, ra = clamp_pad(before, dim), clamp_pad(after, dim)
        reflect_cfg[axis] = (rb, ra)
        zb, za = before - rb, after - ra
        if zb or za:
            need_zero = True
        zero_cfg[axis] = (zb, za)

    out = jnp.pad(x, reflect_cfg, mode="reflect")
    if need_zero:
        out = jnp.pad(out, zero_cfg, mode="constant")
    return out
