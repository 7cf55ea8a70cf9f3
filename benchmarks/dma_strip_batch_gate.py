"""Batch break-even for the whole-strip splice form (round-5 verdict item 3).

Round 4 measured the strip form FASTER than the windowed direct form at
the exact headline config (batch-4 4K: 0.949 vs 0.997 ms) and SLOWER
single-frame (sigma=48: 0.483 vs 0.309) — and left it opt-in. This sweep
measures the crossover over the PLANE count (batch x channels — the
kernel's flattened leading dim) so routing can gate on it like every
other measured crossover: interleaved strip/direct timing pairs at 4K,
sigma 10 and 48, plane counts 3/6/9/12 (batch 1-4 RGB).

Writes ``benchmarks/dma_strip_batch_gate.json``; the passing boundary
feeds ``DeviceSpec.dma_strip_min_planes``.

Usage: python benchmarks/dma_strip_batch_gate.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_dma import (
        _blur_fused_dma_impl,
        _pick_tile_dma,
        _strip_applicable,
    )
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    if jax.default_backend() != "tpu":
        print("needs the TPU backend", file=sys.stderr)
        return 2

    h, w = 2160, 3840
    rng = np.random.default_rng(7)
    rows = []
    for sigma in (10.0, 48.0):
        plan = make_plan((h, w), sigma)
        prec = "hybrid"
        for planes in (3, 6, 9, 12):
            x = jnp.asarray(
                (rng.random((planes, h, w)) * 255).astype(np.uint8)
            )
            mp = planes / 3 * h * w / 1e6

            def mk(strip):
                def step(v):
                    return _blur_fused_dma_impl(
                        v, plan, prec, True, strip=strip
                    )

                return step

            row = {"sigma": sigma, "planes": planes}
            # interleaved: direct, strip, direct, strip (min-of-reps each)
            for nm, s in (("direct", False), ("strip", True),
                          ("direct2", False), ("strip2", True)):
                r = time_fn_chained(
                    lambda s=s: mk(s), x, iters=8, reps=3,
                    name=f"{nm}-p{planes}-s{sigma}", megapixels=mp,
                )
                row[nm + "_ms"] = round(r.median_ms, 3)
            row["direct_ms"] = min(row["direct_ms"], row.pop("direct2_ms"))
            row["strip_ms"] = min(row["strip_ms"], row.pop("strip2_ms"))
            row["strip_wins"] = row["strip_ms"] < row["direct_ms"]
            rows.append(row)
            print(json.dumps(row), flush=True)

    # break-even: smallest plane count at which strip wins at EVERY
    # measured sigma (conservative — a mixed verdict keeps direct)
    counts = sorted({r["planes"] for r in rows})
    floor = None
    for p in counts:
        if all(r["strip_wins"] for r in rows if r["planes"] >= p):
            floor = p
            break
    out = {
        "backend": "tpu",
        "shape": [h, w],
        "rows": rows,
        "strip_min_planes": floor,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dma_strip_batch_gate.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"strip_min_planes": floor}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
