"""Does the DMA kernel pay for its unaligned in-VMEM window slice?

The compute path slices the true halo window out of each aligned fetch:
``win[slot][ro:ro+sh, co:co+sw]`` with ``co = ceil128(rw) - rw`` — a
LANE-offset VMEM slice whenever ``rw % 128 != 0``, which Mosaic may
implement as a relayout (lane rotate) of the whole ~1 MB window before
the band dots. The VPU-chain probe (``hybrid_vpu_fold.json``) showed the
elementwise chain is only a few percent of the window time, so a hidden
relayout is the next candidate for the ~20 us/window gap between the
dot+VPU model (~5 us) and the measured ~27 us.

Diagnostic: sweep BOX radii (support = 2*radius for the folded 2-pass
tent) so ``co`` sawtooths (co = ceil128(2R) - 2R) while the band MAC
count grows smoothly with R. If wall time correlates with the sawtooth
(dips at co = 0) rather than growing smoothly, the relayout is real and
the zero-padded-band aligned-compute rework pays. Writes
``benchmarks/dma_align_probe.json``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels import fused_dma
    from blur_algorithms_tpu.utils.timing import time_fn_chained
    from bench import make_frames

    H, W = 2160, 3840
    x = jnp.asarray(make_frames(4, H, W))
    mp = 4 * H * W / 1e6
    # box radii -> support 2R: co sawtooths 128 -> 0 as 2R crosses each
    # 128 multiple (co = ceil128(2R) - 2R). The sharpest test is the
    # cliff pair (R=64 -> co=0 vs R=66 -> co=124): near-identical MACs,
    # maximal alignment contrast — batch 4 to get above tunnel noise.
    radii = [60, 62, 64, 66, 68, 126, 128, 130]
    rows = {}
    for rnd in range(5):
        for R in radii:
            plan = make_plan((H, W), R, kernel="box_fast", box_passes=2)
            rw = plan.row.support_radius
            co = -(-rw // 128) * 128 - rw
            t = time_fn_chained(
                lambda pl_=plan: (
                    lambda v: fused_dma.blur_fused_u8_dma(
                        v, pl_, precision="hybrid"
                    )
                ),
                x, iters=16, reps=3, name=f"R{R}", megapixels=mp,
            )
            rows.setdefault(R, {"support_r": rw, "co": co, "ms": []})
            rows[R]["ms"].append(t.median_ms)
            print(f"round {rnd} R={R} support={rw} co={co}: "
                  f"{t.median_ms:.3f} ms", flush=True)
    for R in rows:
        rows[R]["ms_min"] = min(rows[R]["ms"])
    out = {"frame": [H, W], "precision": "hybrid", "cases": rows}
    print(json.dumps({R: (v["co"], round(v["ms_min"], 3))
                      for R, v in rows.items()}, indent=1))
    with open("benchmarks/dma_align_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
