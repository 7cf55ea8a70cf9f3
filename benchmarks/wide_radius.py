"""Wide-kernel engine crossover sweep: fused (single/split) vs fft_mxu vs band.

Measures every MXU engine across kernel support radii on a fixed frame and
writes ``benchmarks/wide_radius.json`` — the data behind AUTO's routing
thresholds (fused to r~2560, then the radius-independent four-step MXU FFT;
see ``api._AUTO_FUSED_MAX_RADIUS`` and PERF.md "Wide kernels").

Usage: python benchmarks/wide_radius.py [--hw 8192 8192] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--hw", nargs=2, type=int, default=[8192, 8192])
    p.add_argument("--sigmas", nargs="+", type=float,
                   default=[107.0, 160.0, 308.0, 462.0, 615.0, 1000.0])
    p.add_argument("--out", default="benchmarks/wide_radius.json")
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops import band_matmul
    from blur_algorithms_tpu.ops.layout import round_to_u8
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels import fused_blur
    from blur_algorithms_tpu.pallas_kernels.fft4step import blur_fft_mxu_pallas
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    h, w = args.hw
    mp = h * w / 1e6
    x = jax.jit(
        lambda k: jax.random.randint(k, (3, h, w), 0, 256, dtype=jnp.int32)
        .astype(jnp.uint8)
    )(jax.random.PRNGKey(0))

    results = []
    for sigma in args.sigmas:
        plan = make_plan((h, w), sigma)
        r = int(plan.col.support_radius)
        row = {"h": h, "w": w, "sigma": sigma, "radius": r}

        variants = {
            "fused_auto": lambda v, plan=plan: fused_blur.blur_fused_u8(
                v, plan, precision="bf16x3"
            ),
            "fused_split": lambda v, plan=plan: fused_blur._blur_fused_split(
                v, plan, "bf16x3", out_u8=True
            ),
            "fft_mxu": lambda v, plan=plan: round_to_u8(
                blur_fft_mxu_pallas(v.astype(jnp.float32), plan)
            ),
            "band": lambda v, plan=plan: round_to_u8(
                band_matmul.blur_band_matmul(
                    v.astype(jnp.float32), plan, precision="bf16x3"
                )
            ),
        }
        for name, fn in variants.items():
            try:
                res = time_fn_chained(
                    lambda fn=fn: fn, x, iters=args.iters, reps=2,
                    name=name, megapixels=mp,
                )
                row[name + "_ms"] = round(res.median_ms, 2)
                row[name + "_mps"] = round(res.mpix_per_s, 1)
            except Exception as exc:
                row[name + "_err"] = type(exc).__name__
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
