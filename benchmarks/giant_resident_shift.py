"""Shift-ring resident variant + stage decomposition at the 348 MP point
(round-5 verdict item 4, second measurement pass).

The double-write ring A/B (``giant_resident_ab.json``) showed the
resident family monotonically improving with strip height but VMEM-capped
at th=240 (the 2P-segment ring) and losing 9% to the windowed form. The
shift-ring protocol halves the ring ((P)*th rows + an explicit per-step
segment shift), unlocking th up to ~520. This measures the shift variant
across heights INTERLEAVED with the windowed baseline, then decomposes
the best height with the resident form's own ablate probes.

Writes ``benchmarks/giant_resident_shift.json``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels import fused_dma
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    H, W = 24000, 14500
    sigma = float(H) ** 0.5
    mp = H * W / 1e6

    @jax.jit
    def gen():
        iy = jnp.arange(H, dtype=jnp.int32)[:, None]
        ix = jnp.arange(W, dtype=jnp.int32)[None, :]
        base = (iy * 7 + ix * 13) % 251
        return jnp.stack(
            [(base + 17 * c).astype(jnp.uint8) for c in range(3)]
        )

    x = gen()
    plan = make_plan((H, W), sigma)
    rh, rw = plan.col.support_radius, plan.row.support_radius
    print(f"geometry {H}x{W}, sigma {sigma:.1f}, radius {rh}", flush=True)

    def res_fn(prec, th):
        return lambda v: fused_dma._dma_kernel_call_resident(
            v, plan, prec, True, th, 128, 120, shift_ring=True
        )[:, :H, :W]

    stages = [(
        "windowed_hybrid",
        lambda v: fused_dma._blur_fused_dma_impl(v, plan, "hybrid", True),
    )]
    for th in (240, 320, 400, 480, 520):
        if fused_dma._resident_applicable(
            H, W, th, rh, rw, 1, 1, "hybrid", False, shift_ring=True
        ):
            stages.append((f"resS{th}_hybrid", res_fn("hybrid", th)))
    for prec in ("ablate_fetch", "ablate_rows"):
        stages.append((f"resS480_{prec}", res_fn(prec, 480)))

    ref = fused_dma._blur_fused_dma_impl(x, plan, "hybrid", True)
    for name, fn in stages[1:]:
        if name.endswith("hybrid"):
            same = bool(jnp.array_equal(ref, fn(x)))
            print(f"  {name} bit-identical: {same}", flush=True)
            assert same, name
    del ref

    res: dict[str, list[float]] = {}
    for rnd in range(3):
        for name, fn in stages:
            t = time_fn_chained(
                lambda fn=fn: fn, x, iters=6, reps=3, name=name,
                megapixels=mp,
            )
            res.setdefault(name, []).append(t.median_ms)
            print(f"  round {rnd} {name}: {t.median_ms:.2f} ms", flush=True)

    out = {
        "geometry": [H, W], "sigma": sigma, "radius": rh,
        "ms_min": {k: min(v) for k, v in res.items()},
        "ms_all": res,
    }
    print(json.dumps(out["ms_min"], indent=1))
    with open("benchmarks/giant_resident_shift.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
