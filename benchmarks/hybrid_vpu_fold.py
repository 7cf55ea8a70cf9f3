"""A/B the hybrid rung's requant-shift fold (round-4 verdict item 2).

The round-3 analysis left the per-window VPU elementwise chain as the
headline limiter hypothesis (PERF.md "where the headline millisecond
goes"): slots, deeper buffering and software pipelining all measured
neutral, and hybrid's halved dot count bought only 1.2x. This probe
measures the named round-4 lever — folding the rows requant shift into
the f32 output scale (``fused_dma._HYBRID_FOLD_SHIFT``: the E-plane
chain loses the int32 add + arithmetic shift and one rounding step) —
plus the optional f32-accumulated rows variant
(``_HYBRID_ROWS_F32``: one cast shorter still).

Interleaved rounds at the headline config (batch-4 4K sigma=10) and two
wider radii; fresh plans per variant give fresh traces (plans hash by
identity — the ``dma_slot_sweep`` mechanism). Accuracy: each variant's
output is gated <= 1 count against the CPU pocketfft oracle at every
timed config (the full 9-pattern cert re-run lives in
``hybrid_cert*.json``). Writes ``benchmarks/hybrid_vpu_fold.json``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# "fold_f32rows" (acc_f32 rows dots, one cast shorter) is REFUTED at the
# compiler: Mosaic rejects int8-operand matmuls with an f32 accumulator
# ("float acc with int lhs. Expected float lhs", tpu.matmul) — the int32
# accumulate + convert chain is the only legal lowering, so the probe
# carries the two legal variants.
VARIANTS = {
    "legacy": (False, False),
    "fold": (True, False),
}


def main() -> int:
    import jax.numpy as jnp

    from blur_algorithms_tpu import oracle
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels import fused_dma
    from blur_algorithms_tpu.utils.timing import time_fn_chained
    from bench import make_frames

    H, W = 2160, 3840
    configs = [
        ("headline_s10_b4", 10.0, 4),
        ("s48_b1", 48.0, 1),
        ("s90_b1", 90.0, 1),
    ]
    frames = {b: jnp.asarray(make_frames(b, H, W)) for b in (1, 4)}

    timings: dict[str, dict[str, list[float]]] = {
        name: {v: [] for v in VARIANTS} for name, _, _ in configs
    }
    for rnd in range(3):
        for name, sigma, b in configs:
            x = frames[b]
            mp = b * H * W / 1e6
            for vname, (fold, f32rows) in VARIANTS.items():
                plan = make_plan((H, W), sigma)
                fused_dma._HYBRID_FOLD_SHIFT = fold
                fused_dma._HYBRID_ROWS_F32 = f32rows
                t = time_fn_chained(
                    lambda pl_=plan: (
                        lambda v: fused_dma.blur_fused_u8_dma(
                            v, pl_, precision="hybrid"
                        )
                    ),
                    x, iters=16, reps=3, name=f"{name}:{vname}",
                    megapixels=mp,
                )
                timings[name][vname].append(t.median_ms)
                print(f"round {rnd} {name} {vname}: {t.median_ms:.3f} ms",
                      flush=True)

    # accuracy gate per variant at each timed sigma (single frame)
    acc: dict[str, dict[str, int]] = {v: {} for v in VARIANTS}
    x1 = np.asarray(frames[1][0])  # (3, H, W) u8
    for name, sigma, _ in configs:
        want = np.moveaxis(
            oracle.blur_u8(np.moveaxis(x1, 0, -1), float(sigma)), -1, 0
        )
        for vname, (fold, f32rows) in VARIANTS.items():
            plan = make_plan((H, W), sigma)
            fused_dma._HYBRID_FOLD_SHIFT = fold
            fused_dma._HYBRID_ROWS_F32 = f32rows
            got = np.asarray(fused_dma.blur_fused_u8_dma(
                frames[1], plan, precision="hybrid"
            ))[0]
            acc[vname][name] = int(
                np.abs(got.astype(int) - want.astype(int)).max()
            )
    fused_dma._HYBRID_FOLD_SHIFT = True
    fused_dma._HYBRID_ROWS_F32 = False

    out = {
        "config": {"frame": [H, W], "iters": 16, "reps": 3, "rounds": 3},
        "timings_ms_min": {
            name: {v: min(ts) for v, ts in vs.items()}
            for name, vs in timings.items()
        },
        "timings_ms_all": timings,
        "max_err_vs_oracle": acc,
    }
    print(json.dumps(out["timings_ms_min"], indent=1))
    print(json.dumps(acc, indent=1))
    with open("benchmarks/hybrid_vpu_fold.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
