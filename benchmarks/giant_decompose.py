"""Decompose the 348 MP point's 43 ms (round-4 verdict item 3).

The 24000x14500 sigma~155 row is the 46-point sweep's weakest margin
(39.8x) and runs ~43 ms against a ~16 ms roofline-ish estimate. This
splits the wall time with the same stage ladder the headline got
(``ablate_*`` probe precisions) plus the wrapper delta:

  e2e        = blur_u8-equivalent interleaved path (layout wrappers in)
  planar     = the DMA impl on planar input (no de/interleave)
  rows       = fetch + recentre + exact int8 rows dots (no cols stage)
  copy       = fetch + slice + trivial tile store (no band compute)
  fetch      = window DMAs + loop + out writeback only

Frames are GENERATED ON DEVICE (a 1 GB host upload through the tunnel
would dwarf the measurement). Writes ``benchmarks/giant_decompose.json``.
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
    sigma = float(H) ** 0.5  # the published sweep's rule: sigma = sqrt(x)
    mp = H * W / 1e6

    @jax.jit
    def gen():
        iy = jnp.arange(H, dtype=jnp.int32)[:, None]
        ix = jnp.arange(W, dtype=jnp.int32)[None, :]
        base = (iy * 7 + ix * 13) % 251
        return jnp.stack(
            [(base + 17 * c).astype(jnp.uint8) for c in range(3)]
        )

    x = gen()  # (3, H, W) u8 on device
    xi = jnp.moveaxis(x, 0, -1)  # interleaved (H, W, 3)

    plan = make_plan((H, W), sigma)
    r = plan.col.support_radius
    print(f"geometry: {H}x{W}, sigma {sigma:.1f}, support radius {r}",
          flush=True)

    def planar_fn(prec):
        return lambda v: fused_dma._blur_fused_dma_impl(v, plan, prec, True)

    def e2e(v):  # the interleaved path the sweep times (moveaxis wrappers)
        p = jnp.moveaxis(v, -1, -3)
        return jnp.moveaxis(
            fused_dma._blur_fused_dma_impl(p, plan, "hybrid", True), -3, -1
        )

    stages = [
        ("e2e_hybrid", e2e, xi),
        ("planar_hybrid", planar_fn("hybrid"), x),
        ("planar_int8", planar_fn("int8"), x),
        ("ablate_rows", planar_fn("ablate_rows"), x),
        ("ablate_copy", planar_fn("ablate_copy"), x),
        ("ablate_fetch", planar_fn("ablate_fetch"), x),
    ]
    res = {}
    for rnd in range(3):
        for name, fn, inp in stages:
            t = time_fn_chained(
                lambda fn=fn: fn, inp, iters=8, reps=3, name=name,
                megapixels=mp,
            )
            res.setdefault(name, []).append(t.median_ms)
            print(f"round {rnd} {name}: {t.median_ms:.2f} ms "
                  f"({mp / t.median_ms * 1e3:.0f} MP/s)", flush=True)

    mins = {k: min(v) for k, v in res.items()}
    out = {"geometry": [H, W], "sigma": sigma, "radius": r,
           "ms_min": mins, "ms_all": res}
    print(json.dumps(mins, indent=1))
    with open("benchmarks/giant_decompose.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
