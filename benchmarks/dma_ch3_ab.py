"""Interleaved A/B: channel-folded (nch=3) vs per-plane direct DMA form.

Round-5 verdict item 2: the headline's measured floor is 81% window
MOVEMENT (``dma_stage_ladder_r4.json``) and the round-4 analysis blames
per-window descriptor chains. The folded form moves each window across
all 3 contiguous channel planes with ONE descriptor (same bytes, 1/3 the
descriptors, grid walks frames instead of planes). Interleaved
min-of-reps pairs at the headline config (batch-4 4K u8 hybrid) and at
sigma=48; plus batch-1. Writes ``benchmarks/dma_ch3_ab.json``.

Usage: python benchmarks/dma_ch3_ab.py
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
    )
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    if jax.default_backend() != "tpu":
        print("needs the TPU backend", file=sys.stderr)
        return 2

    h, w = 2160, 3840
    rng = np.random.default_rng(11)
    rows = []
    for batch, sigma in ((4, 10.0), (4, 48.0), (1, 10.0)):
        plan = make_plan((h, w), sigma)
        x = jnp.asarray(
            (rng.random((batch, 3, h, w)) * 255).astype(np.uint8)
        )
        mp = batch * h * w / 1e6

        def mk(nch):
            def step(v):
                return _blur_fused_dma_impl(
                    v, plan, "hybrid", True, direct=True, strip=False, nch=nch
                )

            return step

        row = {"batch": batch, "sigma": sigma}
        for nm, nch in (("plane", 1), ("ch3", 3),
                        ("plane2", 1), ("ch32", 3)):
            r = time_fn_chained(
                lambda nch=nch: mk(nch), x, iters=10, reps=3,
                name=f"{nm}-b{batch}-s{sigma}", megapixels=mp,
            )
            row[nm + "_ms"] = round(r.median_ms, 3)
        row["plane_ms"] = min(row["plane_ms"], row.pop("plane2_ms"))
        row["ch3_ms"] = min(row["ch3_ms"], row.pop("ch32_ms"))
        row["speedup"] = round(row["plane_ms"] / row["ch3_ms"], 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dma_ch3_ab.json")
    with open(path, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
