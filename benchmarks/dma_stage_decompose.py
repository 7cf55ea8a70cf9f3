"""Intra-kernel stage decomposition of the DMA form (round-4 item 2/3).

Stage ladder via the probe-only ``ablate_*`` precisions (same pipeline,
same window DMAs, compute truncated):

  copy   = fetch + window slice + u8 tile store
  rows   = copy + recentre + exact int8 rows dots
  hybrid = rows + E cast chain + bf16 cols dot + quantize store

run under BOTH window-slice modes (legacy slice vs aligned zero-padded
bands), at the headline config and the alignment-cliff box geometry. The
stage deltas localize the co-dependent cost that the sawtooth probe
exposed and the aligned A/B failed to remove. Writes
``benchmarks/dma_stage_decompose.json``.
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
    x4 = jnp.asarray(make_frames(4, H, W))
    mp = 4 * H * W / 1e6

    configs = [
        ("headline_s10", lambda: make_plan((H, W), 10.0)),
        ("boxR66_cliff", lambda: make_plan((H, W), 66, kernel="box_fast",
                                           box_passes=2)),
    ]
    stages = ["ablate_copy", "ablate_rows", "hybrid"]
    modes = [("legacy", False), ("aligned", True)]

    out = {}
    for rnd in range(3):
        for cname, mk in configs:
            for mname, flag in modes:
                fused_dma._ALIGNED_COMPUTE = flag
                for stage in stages:
                    plan = mk()
                    t = time_fn_chained(
                        lambda pl_=plan, s=stage: (
                            lambda v: fused_dma._blur_fused_dma_impl(
                                v, pl_, s, True
                            )
                        ),
                        x4, iters=16, reps=3,
                        name=f"{cname}:{mname}:{stage}", megapixels=mp,
                    )
                    key = f"{cname}.{mname}.{stage}"
                    out.setdefault(key, []).append(t.median_ms)
                    print(f"round {rnd} {key}: {t.median_ms:.3f} ms",
                          flush=True)
    fused_dma._ALIGNED_COMPUTE = False  # the refuted-default state

    mins = {k: min(v) for k, v in out.items()}
    print(json.dumps(mins, indent=1))
    with open("benchmarks/dma_stage_decompose.json", "w") as f:
        json.dump({"ms_min": mins, "ms_all": out}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
