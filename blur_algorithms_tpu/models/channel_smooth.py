"""Per-channel smoothing recipes — the reference's color-cleanup workflow.

The reference's evaluation corpora (``test_images/Clean Up Comparisons``,
``test_images/Test 2``) compare blur recipes that smooth each channel of a
Lab / YCrCb image with a *different* sigma ("Smooth 5-5-7", "9-9-9",
"1-11-11") for color-transfer cleanup. This module makes that workflow a
first-class call: convert, blur channel c with sigma[c], convert back.

Color conversion uses OpenCV when present (exactly what the reference's
author used); plain RGB recipes need no conversion and run everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from blur_algorithms_tpu.api import Engine, blur

__all__ = ["channel_smooth"]

_CSPACES = ("rgb", "lab", "ycrcb")


def channel_smooth(
    img_u8: np.ndarray,
    sigmas,
    colorspace: str = "rgb",
    engine: Engine | str = Engine.AUTO,
) -> np.ndarray:
    """Blur each channel with its own sigma, optionally in Lab/YCrCb.

    ``img_u8``: (H, W, 3) uint8 RGB. ``sigmas``: one per channel; 0 or None
    leaves a channel untouched. Returns uint8 RGB.
    """
    img_u8 = np.asarray(img_u8)
    if img_u8.dtype != np.uint8 or img_u8.ndim != 3 or img_u8.shape[-1] != 3:
        raise ValueError("channel_smooth expects (H, W, 3) uint8 RGB")
    if colorspace not in _CSPACES:
        raise ValueError(f"colorspace must be one of {_CSPACES}")
    sigmas = list(sigmas)
    if len(sigmas) != 3:
        raise ValueError("need exactly 3 sigmas")

    if colorspace == "rgb":
        work = img_u8.astype(np.float32)
    else:
        import cv2

        code = cv2.COLOR_RGB2Lab if colorspace == "lab" else cv2.COLOR_RGB2YCrCb
        work = cv2.cvtColor(img_u8, code).astype(np.float32)

    planes = []
    for c, sigma in enumerate(sigmas):
        plane = work[..., c]
        if sigma and float(sigma) > 0:
            plane = np.asarray(
                blur(jnp.asarray(plane), float(sigma), engine=engine)
            )
        planes.append(plane)
    out = np.stack(planes, axis=-1)

    if colorspace == "rgb":
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    import cv2

    code = cv2.COLOR_Lab2RGB if colorspace == "lab" else cv2.COLOR_YCrCb2RGB
    out_u8 = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return cv2.cvtColor(out_u8, code)
