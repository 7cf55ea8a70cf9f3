"""Interleaved timing: the DMA form's bf16 rung vs int8 at the headline shape.

Prints per-precision chained-scan timings (tunnel-safe) on batch-4 4K
uint8 sigma=10 — the bench.py configuration — plus a correctness line vs
the oracle for the bf16 route. Run on the real chip.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    from bench import BATCH, H, SIGMA, W, make_frames

    from blur_algorithms_tpu import oracle
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_dma import blur_fused_u8_dma
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    frames = make_frames(BATCH, H, W)
    plan = make_plan((H, W), SIGMA)
    x = jnp.asarray(frames)
    mp = BATCH * H * W / 1e6

    results = {}
    # interleave reps across precisions so tunnel drift hits both equally
    for rnd in range(3):
        for prec in ("int8", "bf16"):
            r = time_fn_chained(
                lambda p=prec: (lambda v: blur_fused_u8_dma(v, plan, precision=p)),
                x, iters=16, reps=4, name=prec, megapixels=mp,
            )
            results.setdefault(prec, []).append(r.median_ms)
            print(f"round {rnd} {prec}: {r.median_ms:.3f} ms "
                  f"({r.mpix_per_s:.0f} MP/s)", flush=True)

    out0 = np.asarray(blur_fused_u8_dma(x, plan, precision="bf16"))[0]
    want = np.moveaxis(oracle.blur_u8(np.moveaxis(frames[0], 0, -1), SIGMA), -1, 0)
    d = np.abs(out0.astype(int) - want.astype(int))
    summary = {
        prec: {"best_ms": min(v), "best_mps": round(mp / min(v) * 1e3, 1)}
        for prec, v in results.items()
    }
    summary["bf16_max_err"] = int(d.max())
    summary["bf16_exact"] = round(float((d == 0).mean()), 5)
    print(json.dumps(summary))
    with open("benchmarks/bf16_vs_int8.json", "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
