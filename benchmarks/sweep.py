"""Engine benchmark sweep — the reference's benchmark harness, TPU-native.

The reference swept 46 sizes from 1500x1000 upward with sigma = sqrt(width)
(commented loop ``Source.cpp:628-634``; data in ``py/performance.ipynb``).
This reproduces that methodology on TPU across this framework's engines and
writes JSON (and an optional matplotlib PNG) for comparison against
``BASELINE.md``.

Usage:
  python benchmarks/sweep.py [--sizes N] [--engines fused band fft2 ...]
                             [--out benchmarks/sweep_results.json] [--plot]

Timing uses the tunnel-aware chained harness (utils/timing.py).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference sizes: x=1500, y=1000, step x+=225, y+=150 (Source.cpp:628-634)
def reference_sizes(n: int):
    x, y = 1500, 1000
    out = []
    for _ in range(n):
        out.append((x, y))
        x += 225
        y += 150
    return out


REFERENCE_PFFFT_MS = {
    # from BASELINE.md / py/performance.ipynb (subset of anchor points)
    (1500, 1000): 32.05,
    (4000, 2500): 46.92,  # actually 3750x2500 in the size rule; closest anchor
    (12000, 7300): 433.94,
    (24000, 14500): 1728.56,
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, default=12, help="number of sweep sizes")
    p.add_argument("--engines", nargs="+",
                   default=["fused", "band", "fft_tiles", "fft2", "box"])
    p.add_argument("--out", default="benchmarks/sweep_results.json")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu import Engine, blur_u8
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    results = []
    for x, y in reference_sizes(args.sizes):
        sigma = math.sqrt(x)  # reference: sigma = sqrt(width-ish dim)
        # generate frames on-device: the axon tunnel moves ~2 MB/s, so host
        # arrays would dominate the sweep at large sizes
        xj = jax.jit(
            lambda k: jax.random.randint(
                k, (x, y, 3), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8)
        )(jax.random.PRNGKey(x))
        mp = x * y / 1e6
        row = {"h": x, "w": y, "mp": round(mp, 2), "sigma": round(sigma, 2)}
        for name in args.engines:
            eng = Engine(name)
            try:
                mk = lambda: (
                    lambda v: blur_u8(v, sigma, engine=eng, size_mode="pow2")
                )
                # small frames need longer chains: the ~30 ms tunnel RTT noise
                # must stay small next to (iters-1) * per_step
                iters = max(args.iters, min(48, int(24 / max(mp, 0.1))))
                r = time_fn_chained(mk, xj, iters=iters, name=name,
                                    megapixels=mp)
                row[name + "_ms"] = round(r.median_ms, 3)
                row[name + "_mps"] = round(r.mpix_per_s, 1)
            except Exception as exc:  # keep sweeping past OOM/VMEM limits
                row[name + "_ms"] = None
                row[name + "_err"] = f"{type(exc).__name__}"
        ref = REFERENCE_PFFFT_MS.get((x, y))
        if ref:
            row["reference_pffft_ms"] = ref
        results.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mps = [r["mp"] for r in results]
        plt.figure(figsize=(8, 5))
        for name in args.engines:
            ys = [r.get(name + "_ms") for r in results]
            plt.plot(mps, ys, marker="o", label=name)
        plt.xlabel("megapixels")
        plt.ylabel("ms per frame")
        plt.title("blur_algorithms_tpu engine sweep (sigma = sqrt(width))")
        plt.legend()
        plt.grid(alpha=0.3)
        png = os.path.splitext(args.out)[0] + ".png"
        plt.savefig(png, dpi=120)
        print(f"wrote {png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
