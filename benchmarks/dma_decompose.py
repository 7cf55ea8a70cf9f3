"""Attribute the DMA fused form's wall time to its stages.

The headline route (``pallas_kernels/fused_dma.py``) is three stages:
``_assemble_padded`` (thin XLA edge strips + 5 aligned HBM->HBM DMAs per
channel), the double-buffered window kernel (``_dma_kernel_call``), and the
final crop slice. The HBM/MXU roofline for 4K batch-4 r=32 is ~0.7-0.9 ms
(traffic ~450 MB at ~819 GB/s, int8 compute ~0.37 ms), but bench.py
measures ~1.43 ms — this harness locates the gap.

Each stage is timed with the tunnel-safe chained scan
(``utils/timing.time_fn_chained``). Stages whose output shape differs from
their input are closed back to shape-preserving steps by composing a
filler op whose cost is measured separately and subtracted:

* ``roll``        — ``jnp.roll`` on the frame: one full read+write pass, the
                    copy roofline yardstick.
* ``assemble+crop``— pad stage then slice back to the frame; assemble est. =
                    t - t(roll-on-frame).
* ``kernel+embed`` — kernel on a pre-padded constant-size frame, output
                    zero-embedded back to padded size; kernel est. =
                    t - t(roll-on-padded).
* ``full``        — the production ``_blur_fused_dma_impl``.

Usage: python benchmarks/dma_decompose.py [--hw 2160 3840] [--batch 4]
           [--sigma 10] [--out benchmarks/dma_decompose.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--hw", nargs=2, type=int, default=[2160, 3840])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--sigma", type=float, default=10.0)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="benchmarks/dma_decompose.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_dma import (
        _align_geometry,
        _assemble_padded,
        _blur_fused_dma_impl,
        _dma_kernel_call,
        _pick_chunks_dma,
        _pick_tile_dma,
    )
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    h, w = args.hw
    plan = make_plan((h, w), args.sigma)
    rh, rw = plan.col.support_radius, plan.row.support_radius
    th, tw = _pick_tile_dma(plan, 1, "int8")
    cw, ch = _pick_chunks_dma(th, tw, rh, rw, "int8")
    orh, orw, ro, co, sh, sw, shp, swp = _align_geometry(th, tw, rh, rw)
    nbh, nbw = -(-h // th), -(-w // tw)
    hp, wp = (nbh - 1) * th + shp, (nbw - 1) * tw + swp
    bc = args.batch * 3
    mp = args.batch * h * w / 1e6

    print(f"plan r=({rh},{rw}) tile=({th},{tw}) chunks=({cw},{ch}) "
          f"padded=({hp},{wp}) grid=({bc},{nbh})x{nbw}", flush=True)

    x = jax.jit(
        lambda k: jax.random.randint(
            k, (args.batch, 3, h, w), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
    )(jax.random.PRNGKey(0))
    xf = x.reshape(bc, h, w)
    xp = jax.jit(
        lambda v: _assemble_padded(v, rh, rw, orh, orw, hp, wp)
    )(xf)

    def t(name, mk, arr):
        res = time_fn_chained(
            mk, arr, iters=args.iters, reps=args.reps, name=name,
            megapixels=mp,
        )
        print(f"  {name}: {res.median_ms:.3f} ms", flush=True)
        return res.median_ms

    results = {
        "hw": [h, w], "batch": args.batch, "sigma": args.sigma,
        "tile": [th, tw], "chunks": [cw, ch], "padded": [hp, wp],
    }

    # copy rooflines: one full read+write pass at each working size
    results["roll_frame_ms"] = t(
        "roll(frame)", lambda: (lambda v: jnp.roll(v, 1, axis=-2)), xf
    )
    results["roll_padded_ms"] = t(
        "roll(padded)", lambda: (lambda v: jnp.roll(v, 1, axis=-2)), xp
    )

    # pad stage (+ crop back to frame shape so the step chains)
    results["assemble_crop_ms"] = t(
        "assemble+crop",
        lambda: (
            lambda v: _assemble_padded(v, rh, rw, orh, orw, hp, wp)[
                :, orh : orh + h, orw : orw + w
            ]
        ),
        xf,
    )

    # kernel stage (+ zero-embed back to padded shape so the step chains)
    def kernel_embed(v):
        out = _dma_kernel_call(v, plan, "int8", True, th, tw, cw, ch)
        return jnp.pad(
            out[:, :h, :w],
            [(0, 0), (orh, hp - orh - h), (orw, wp - orw - w)],
        )

    results["kernel_embed_ms"] = t(
        "kernel+embed", lambda: (lambda _v: kernel_embed(_v)), xp
    )

    # assemble-pipeline end-to-end (what the stages above decompose)
    results["full_ms"] = t(
        "full(assemble)",
        lambda: (
            lambda v: _blur_fused_dma_impl(v, plan, "int8", True,
                                           direct=False)
        ),
        x,
    )
    # production end-to-end (auto-routes to the direct no-assemble form
    # in the whole-height regime — compare against full_ms to see the
    # assemble stage's true cost in situ)
    results["production_ms"] = t(
        "production",
        lambda: (lambda v: _blur_fused_dma_impl(v, plan, "int8", True)),
        x,
    )

    results["assemble_est_ms"] = round(
        results["assemble_crop_ms"] - results["roll_frame_ms"], 4
    )
    results["kernel_est_ms"] = round(
        results["kernel_embed_ms"] - results["roll_padded_ms"], 4
    )
    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
