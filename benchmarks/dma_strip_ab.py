"""A/B the whole-strip splice kernel vs the windowed direct form.

The stage decomposition showed the windowed form spends ~0.80 of its
0.99 ms headline on window movement (fetch + splice descriptors + the
1.57x horizontal overlap re-read). ``_kernel_strip`` fetches each padded
row strip once (<= 5 DMAs), prefetched across grid steps, and computes
the unrolled window loop from VMEM — bit-identical outputs. Interleaved
strip-vs-direct at the headline and across the radius span the strip
VMEM gate admits. Writes ``benchmarks/dma_strip_ab.json``.
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

    configs = [
        ("headline_s10_b4_hybrid", 10.0, "gaussian", 4, "hybrid"),
        ("headline_s10_b4_int8", 10.0, "gaussian", 4, "int8"),
        ("s48_b1_hybrid", 48.0, "gaussian", 1, "hybrid"),
        ("s90_b1_hybrid", 90.0, "gaussian", 1, "hybrid"),
        ("s120_b1_hybrid", 120.0, "gaussian", 1, "hybrid"),
        ("boxR66_b4_hybrid", 66, "box_fast", 4, "hybrid"),
    ]
    modes = [("direct", dict(direct=True, strip=False)),
             ("strip", dict(strip=True))]
    timings = {name: {m: [] for m, _ in modes} for name, *_ in configs}
    for rnd in range(3):
        for name, sig, kern, b, prec in configs:
            x = frames[b]
            mp = b * H * W / 1e6
            for mode, kw in modes:
                plan = mk(sig, kern)
                t = time_fn_chained(
                    lambda pl_=plan, p=prec, kw=kw: (
                        lambda v: fused_dma._blur_fused_dma_impl(
                            v, pl_, p, True, **kw
                        )
                    ),
                    x, iters=16, reps=3, name=f"{name}:{mode}",
                    megapixels=mp,
                )
                timings[name][mode].append(t.median_ms)
                print(f"round {rnd} {name} {mode}: {t.median_ms:.3f} ms",
                      flush=True)

    ident = {}
    for name, sig, kern, b, prec in configs:
        a = np.asarray(fused_dma._blur_fused_dma_impl(
            frames[1], mk(sig, kern), prec, True, direct=True, strip=False))
        g = np.asarray(fused_dma._blur_fused_dma_impl(
            frames[1], mk(sig, kern), prec, True, strip=True))
        ident[name] = bool((a == g).all())

    out = {
        "timings_ms_min": {
            n: {m: min(v) for m, v in ms.items()} for n, ms in timings.items()
        },
        "timings_ms_all": timings,
        "bit_identical": ident,
    }
    print(json.dumps(out["timings_ms_min"], indent=1))
    print("identity:", json.dumps(ident))
    with open("benchmarks/dma_strip_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
