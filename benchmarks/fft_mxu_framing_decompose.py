"""Round-5 decomposition of the fft_mxu wide-radius wall (verdict item 1).

PERF.md's round-2 floor measurement showed the per-axis cost splits into
the Pallas kernel (load/store floor + roofline dots) and XLA framing
copies (reflect-pad + pre-rotation in, un-rotation + crop out, plus the
whole-frame transpose each way for the cols axis). This harness times the
split AT THE TARGET GEOMETRY (the 67 MP frame past the fused/fft
crossover, ``benchmarks/wide_radius.json`` rows 5-6) so the in-kernel
framing lever can be sized before building it:

* full      — ``blur_fft_mxu_pallas`` both axes (the production path)
* rows/cols — one ``conv_axis`` pass in isolation
* kernel    — ``fft_conv_rows`` alone on pre-framed rows (framing = pass - kernel)

Usage: python benchmarks/fft_mxu_framing_decompose.py [--sigma 1000] [--hw 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=1000.0)
    ap.add_argument("--hw", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fft_mxu_framing_decompose.json"))
    args = ap.parse_args()

    from blur_algorithms_tpu.ops.fft_mxu import conv_axis, transform_length
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fft4step import (
        _conv_rows_pallas,
        blur_fft_mxu_pallas,
    )
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    h = w = args.hw
    plan = make_plan((h, w), args.sigma)
    n = transform_length(plan.row)
    r = plan.row.support_radius
    mp = 3 * h * w / 1e6
    print(f"geometry: (3, {h}, {w}) f32, sigma={args.sigma} -> r={r}, "
          f"n={n}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, h, w)).astype(np.float32) * 255.0)
    rows_framed = jnp.asarray(
        rng.random((3 * h, n)).astype(np.float32) * 255.0
    )

    results = {"h": h, "w": w, "sigma": args.sigma, "radius": r, "n": n}

    def t(name, mk, v, px_m):
        # steps are shape-preserving x -> x so the chained scan serializes
        res = time_fn_chained(mk, v, iters=args.iters, reps=args.reps,
                              name=name, megapixels=px_m)
        results[name + "_ms"] = round(res.median_ms, 3)
        results[name + "_mps"] = round(res.mpix_per_s, 1)
        print(f"{name}: {res.median_ms:.2f} ms ({res.mpix_per_s:.0f} MP/s)"
              + (" [SUSPECT]" if res.suspect else ""), flush=True)

    t("full", lambda: (lambda v: blur_fft_mxu_pallas(v, plan)), x, mp)
    t("rows_pass",
      lambda: (lambda v: conv_axis(v, plan.row, -1, _conv_rows_pallas)),
      x, mp)
    t("cols_pass",
      lambda: (lambda v: conv_axis(v, plan.col, -2, _conv_rows_pallas)),
      x, mp)
    t("kernel_only",
      lambda: (lambda v: _conv_rows_pallas(v, n, plan.row)),
      rows_framed, mp)

    results["framing_rows_ms"] = round(
        results["rows_pass_ms"] - results["kernel_only_ms"], 3)
    results["framing_cols_ms"] = round(
        results["cols_pass_ms"] - results["kernel_only_ms"], 3)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
