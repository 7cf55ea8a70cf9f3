"""A/B the aligned-compute rework (zero-padded bands vs window slice).

Follow-up to ``dma_align_probe.py``'s sawtooth finding: the per-window
lane-offset VMEM slice costs 39-44% at the alignment cliffs. This
interleaves ``_ALIGNED_COMPUTE`` on/off (fresh plans -> fresh traces) at
the headline config and the probe's worst cliffs, for the hybrid AND
int8 rungs, and checks bit-identity (int paths) / <=1 (bf16) against the
legacy path. Writes ``benchmarks/dma_aligned_ab.json``.
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

    H, W = 2160, 3840
    frames = {b: jnp.asarray(make_frames(b, H, W)) for b in (1, 4)}

    def mk(sig, kern):
        if kern == "box_fast":
            return make_plan((H, W), int(sig), kernel="box_fast",
                             box_passes=2)
        return make_plan((H, W), float(sig))

    configs = [  # (name, sigma/R, kernel, batch, precision)
        ("headline_s10_b4_hybrid", 10.0, "gaussian", 4, "hybrid"),
        ("headline_s10_b4_int8", 10.0, "gaussian", 4, "int8"),
        ("s48_b1_hybrid", 48.0, "gaussian", 1, "hybrid"),
        ("s90_b1_hybrid", 90.0, "gaussian", 1, "hybrid"),
        ("boxR66_b4_hybrid", 66, "box_fast", 4, "hybrid"),  # co=124 cliff
    ]
    timings = {name: {"legacy": [], "aligned": []}
               for name, *_ in configs}
    for rnd in range(3):
        for name, sig, kern, b, prec in configs:
            x = frames[b]
            mp = b * H * W / 1e6
            for mode, flag in (("legacy", False), ("aligned", True)):
                fused_dma._ALIGNED_COMPUTE = flag
                plan = mk(sig, kern)
                t = time_fn_chained(
                    lambda pl_=plan, p=prec: (
                        lambda v: fused_dma.blur_fused_u8_dma(
                            v, pl_, precision=p
                        )
                    ),
                    x, iters=16, reps=3, name=f"{name}:{mode}",
                    megapixels=mp,
                )
                timings[name][mode].append(t.median_ms)
                print(f"round {rnd} {name} {mode}: {t.median_ms:.3f} ms",
                      flush=True)

    # identity vs legacy on one frame per config
    ident = {}
    for name, sig, kern, b, prec in configs:
        fused_dma._ALIGNED_COMPUTE = False
        a = np.asarray(fused_dma.blur_fused_u8_dma(
            frames[1], mk(sig, kern), precision=prec))
        fused_dma._ALIGNED_COMPUTE = True
        g = np.asarray(fused_dma.blur_fused_u8_dma(
            frames[1], mk(sig, kern), precision=prec))
        ident[name] = int(np.abs(a.astype(int) - g.astype(int)).max())
    fused_dma._ALIGNED_COMPUTE = True

    out = {
        "timings_ms_min": {
            n: {m: min(v) for m, v in ms.items()} for n, ms in timings.items()
        },
        "timings_ms_all": timings,
        "max_abs_diff_vs_legacy": ident,
    }
    print(json.dumps(out["timings_ms_min"], indent=1))
    print("identity:", json.dumps(ident))
    with open("benchmarks/dma_aligned_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
