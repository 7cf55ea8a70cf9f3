"""Window-slot sweep for the DMA kernel's manual pipeline.

Hypothesis: at small radii the per-window band compute (~2 us) is much
shorter than a window fetch, so classic double buffering (one DMA in
flight) leaves the loop DMA-latency-bound; k slots keep k-1 fetches in
flight. Interleaves n_slots in {2, 3, 4, 6} at the headline config
(batch-4 4K sigma=10, int8) plus one mid-radius point, checks bit-identity
vs the 2-slot kernel (same DMAs + compute, scheduling only), and writes
``benchmarks/dma_slot_sweep.json``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels import fused_dma
    from blur_algorithms_tpu.utils.timing import time_fn_chained
    from bench import make_frames

    H, W, B = 2160, 3840, 4
    x = jnp.asarray(make_frames(B, H, W))
    mp = B * H * W / 1e6
    slots = [2, 3, 4, 6]
    res = {}
    for sigma in (10.0, 48.0):
        # fresh plan per (sigma, ns): plans hash by identity, so each slot
        # count gets its own trace even though n_slots isn't a jit key
        timings = {ns: [] for ns in slots}
        for rnd in range(3):
            for ns in slots:
                plan = make_plan((H, W), sigma)
                fused_dma._N_WIN_SLOTS = ns
                prec = "int8" if sigma < 20 else "bf16"
                t = time_fn_chained(
                    lambda pl_=plan, p=prec: (
                        lambda v: fused_dma.blur_fused_u8_dma(
                            v, pl_, precision=p
                        )
                    ),
                    x, iters=16, reps=3, name=f"ns{ns}", megapixels=mp,
                )
                timings[ns].append(t.median_ms)
                print(f"sigma {sigma} round {rnd} ns={ns}: "
                      f"{t.median_ms:.3f} ms", flush=True)
        res[sigma] = {ns: min(v) for ns, v in timings.items()}

    # bit-identity: int8 path must be IDENTICAL across slot counts
    plan2 = make_plan((H, W), 10.0)
    fused_dma._N_WIN_SLOTS = 2
    ref = np.asarray(fused_dma.blur_fused_u8_dma(x[:1], plan2, precision="int8"))
    ident = {}
    for ns in (3, 4, 6):
        plan_ns = make_plan((H, W), 10.0)
        fused_dma._N_WIN_SLOTS = ns
        got = np.asarray(
            fused_dma.blur_fused_u8_dma(x[:1], plan_ns, precision="int8")
        )
        ident[ns] = bool((got == ref).all())
    fused_dma._N_WIN_SLOTS = 2
    out = {"timings_ms": res, "bit_identical_vs_2slot": ident}
    print(json.dumps(out))
    with open("benchmarks/dma_slot_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
