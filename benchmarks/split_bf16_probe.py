"""Probe: wide-radius two-pass split at DEFAULT (bf16 single-pass) precision.

Past the DMA cap (r > 600) the u8 route runs the blocked int8-e32 split
(~3 bf16-equivalent dots/px). XLA TPU DEFAULT precision f32 matmul is a
single bf16 pass, so a DEFAULT split costs ~2 equivalents — potentially
~1.3-1.5x in the compute-dominated wide regime. This probe interleaves
int8 vs DEFAULT split timings at 4K for r in the split window and checks
DEFAULT's accuracy vs the oracle (the same dropped-lo error structure the
DMA bf16 rung certified to r=498; here the radii are larger and the taps
smoother still). Writes ``benchmarks/split_bf16_probe.json``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu import oracle
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_blur import (
        _blur_fused_split,
    )
    from blur_algorithms_tpu.utils.timing import time_fn_chained
    from bench import make_frames

    H, W = 2160, 3840
    x = jnp.asarray(make_frames(1, H, W))
    res = {}
    for sigma in (300.0, 400.0, 570.0, 820.0):
        plan = make_plan((H, W), sigma)
        r = plan.col.support_radius
        row = {}
        for prec in ("int8", "DEFAULT"):
            p = prec if prec == "int8" else jax.lax.Precision.DEFAULT
            t = time_fn_chained(
                lambda pp=p, pl=plan: (
                    lambda v: _blur_fused_split(v, pl, pp, out_u8=True)
                ),
                x, iters=8, reps=4, name=str(prec), megapixels=H * W / 1e6,
            )
            row[prec] = round(t.median_ms, 3)
        # accuracy of the DEFAULT split on frame content + a step pattern
        outs = {}
        img = np.asarray(x[0])
        step = np.zeros((3, H, W), np.uint8)
        step[:, :, W // 2:] = 255
        step[:, H // 2:, :] ^= 255
        for name, arr in (("frame", img), ("step", step)):
            got = np.asarray(
                _blur_fused_split(
                    jnp.asarray(arr), plan, jax.lax.Precision.DEFAULT,
                    out_u8=True,
                )
            )
            want = np.moveaxis(
                oracle.blur_u8(np.moveaxis(arr, 0, -1), float(sigma)), -1, 0
            )
            outs[name] = int(np.abs(got.astype(int) - want.astype(int)).max())
        row["default_max_err"] = outs
        res[r] = row
        print("r", r, row, flush=True)
    with open("benchmarks/split_bf16_probe.json", "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
