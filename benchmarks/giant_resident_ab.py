"""Rows-resident vs windowed-direct at the giant-frame point (round-5
verdict item 4).

The 24000x14500 sigma~155 row is the 46-point sweep's weakest margin and
a measured compute-bound floor of the WINDOWED family (43.0 ms = 16.8
movement + 12.0 rows dots + 14.2 cols/store, with a 1.43x rows-recompute
and ~5x input-refetch redundancy baked into the form —
``giant_decompose.json``). The resident form removes both redundancies:
full-width strips fetched once, rows-pass output resident in a VMEM ring
(``fused_dma._kernel_resident``). This measures both forms INTERLEAVED
at the exact sweep geometry plus a second giant point, after asserting
bit-identity on device.

Frames are generated on device (a 1 GB host upload through the tunnel
would dwarf the measurement). Writes ``benchmarks/giant_resident_ab.json``.
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

    geoms = [
        (24000, 14500),   # the sweep's largest row (pffft[45], 1728.56 ms)
        (16000, 12000),   # second giant anchor
    ]
    out = {}
    for H, W in geoms:
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
        r = plan.col.support_radius
        key = f"{H}x{W}"
        print(f"geometry {key}, sigma {sigma:.1f}, radius {r}", flush=True)

        stages = []
        for prec in ("hybrid", "int8"):
            stages.append((
                f"windowed_{prec}",
                lambda v, prec=prec: fused_dma._blur_fused_dma_impl(
                    v, plan, prec, True
                ),
            ))
            for th in (120, 160, 240):
                if not fused_dma._resident_applicable(
                    H, W, th, r, plan.row.support_radius, 1, 1, prec,
                    False,
                ):
                    print(f"  resident th={th} {prec}: VMEM-gated",
                          flush=True)
                    continue
                stages.append((
                    f"resident{th}_{prec}",
                    lambda v, prec=prec, th=th:
                    fused_dma._blur_fused_dma_impl(
                        v, plan, prec, True, tile=(th, 0), resident=True
                    ),
                ))

        # bit-identity before timing (hybrid route = the sweep's route)
        ref = fused_dma._blur_fused_dma_impl(x, plan, "hybrid", True)
        for name, fn in stages:
            if name.startswith("resident") and name.endswith("hybrid"):
                same = bool(jnp.array_equal(ref, fn(x)))
                print(f"  {name} bit-identical: {same}", flush=True)
                assert same, f"{name} is not bit-identical to windowed"
        del ref

        res: dict[str, list[float]] = {}
        for rnd in range(3):
            for name, fn in stages:
                t = time_fn_chained(
                    lambda fn=fn: fn, x, iters=6, reps=3, name=name,
                    megapixels=mp,
                )
                res.setdefault(name, []).append(t.median_ms)
                print(f"  round {rnd} {name}: {t.median_ms:.2f} ms "
                      f"({mp / t.median_ms * 1e3:.0f} MP/s)", flush=True)
        out[key] = {
            "sigma": sigma, "radius": r,
            "ms_min": {k: min(v) for k, v in res.items()},
            "ms_all": res,
        }

    print(json.dumps({k: v["ms_min"] for k, v in out.items()}, indent=1))
    with open("benchmarks/giant_resident_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
