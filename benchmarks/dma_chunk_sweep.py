"""DMA fused-form (tile x chunk) sweep: calibrate ``_pick_chunks_dma``.

The exact-window DMA kernel (``pallas_kernels/fused_dma.py``) runs its band
matmuls in translation-invariant chunks so MACs per output pixel track the
kernel radius (``c + 2r``) instead of the tile size (``t + 2r``). The r<=64
regime was swept by hand (4K batch-4 r=32: dense 2.97 ms -> 1.76 ms at
tile (720, 384), chunks cw=128 / ch=24). This script makes that sweep
rerunnable and extends it to wide radii, where the MAC saving shrinks and
small-M pipeline bubbles may dominate — the data decides whether
``_pick_chunks_dma`` keeps its dense fallback above r=64.

Every timed int8 variant is first checked BIT-IDENTICAL to the dense form
on the full frame (the chunked int8 path skips only exact-zero terms); any
mismatch is reported and the variant dropped. ``--precision bf16x3`` sweeps
the float-dot route instead: there chunking regroups f32 partial sums, so
the gate is max <= 1 uint8 count vs the dense form (the device data this
produces is what would let ``_pick_chunks_dma`` enable bf16x3 chunking).
Candidates whose VMEM estimate exceeds the device budget are skipped
host-side — repeated RESOURCE_EXHAUSTED programs can wedge the axon tunnel
(see .claude/skills/verify/SKILL.md).

Usage: python benchmarks/dma_chunk_sweep.py [--sigmas 14 42 71 143 222]
           [--hw 2160 3840] [--batch 4] [--precision int8|bf16x3]
           [--out benchmarks/dma_chunk_sweep.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--hw", nargs=2, type=int, default=[2160, 3840])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--sigmas", nargs="+", type=float,
                   default=[10.0, 29.0, 50.0, 100.0, 155.0])
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--out", default="benchmarks/dma_chunk_sweep.json")
    p.add_argument("--tiles", nargs="*", type=int, default=None,
                   help="explicit th candidates (default: radius-dependent)")
    p.add_argument("--chunks", nargs="*", type=int, default=None,
                   help="explicit ch candidates (default: 24 72); the "
                        "kernel supports tail chunks, so ch need not "
                        "divide th")
    p.add_argument("--tws", nargs="*", type=int, default=None,
                   help="explicit tw candidates (default: 256 384); the "
                        "cols dots' output width N is tw, and the dot-rate "
                        "microbench shows N=512 reaches ~4x the N=128 rate "
                        "(4 MXUs want >= 512 lanes)")
    p.add_argument("--cws", nargs="*", type=int, default=None,
                   help="explicit cw candidates (default: 128); the MXU "
                        "dot-rate microbench (mxu_dot_rate.py) shows "
                        "n=128 dots at ~half the big-dot rate, so wider "
                        "rows chunks may win at wide radius despite the "
                        "extra cw+2r MACs")
    p.add_argument("--precision", choices=("int8", "bf16x3"), default="int8")
    p.add_argument("--plan-only", action="store_true",
                   help="print the variant grid without touching the device")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_dma import (
        _blur_fused_dma_impl,
        _dma_vmem_bytes,
        _pick_tile_dma,
    )
    from blur_algorithms_tpu.utils.hw import budgets
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    h, w = args.hw
    mp = args.batch * h * w / 1e6
    budget = budgets().wide_vmem_budget
    x = None
    if not args.plan_only:
        x = jax.jit(
            lambda k: jax.random.randint(
                k, (args.batch, 3, h, w), 0, 256, dtype=jnp.int32
            ).astype(jnp.uint8)
        )(jax.random.PRNGKey(0))

    prec = args.precision
    mat_b = 2 if prec == "int8" else 4
    results = []
    for sigma in args.sigmas:
        plan = make_plan((h, w), sigma)
        rh, rw = plan.col.support_radius, plan.row.support_radius
        th0, tw0 = _pick_tile_dma(plan, 1, prec)
        row = {"sigma": sigma, "radius": rh, "precision": prec,
               "policy_tile": [th0, tw0]}
        print(f"== sigma {sigma} radius {rh} policy tile ({th0}, {tw0})",
              flush=True)

        # dense baseline: the REAL dense-regime tile policy (incl. the
        # row-tile cost search), not a reimplementation of its target
        dense_tile = _pick_tile_dma(plan, 1, prec, chunked=False)

        # compiles are ~10-30 s each over the tunnel: keep the grid tight
        # (ch=8 lost everywhere in the r=32 hand sweep, so it is excluded;
        # 216-tall only matters as the dense policy's own tile)
        ths = args.tiles or sorted({dense_tile[0], 432, 720})
        chs = tuple(args.chunks) if args.chunks else (24, 72)
        cws = tuple(args.cws) if args.cws else (128,)
        tws = tuple(args.tws) if args.tws else (256, 384)
        variants = [("dense", dense_tile, (dense_tile[1], dense_tile[0]))]
        for th, tw, cw, ch in itertools.product(ths, tws, cws, chs):
            # tail chunks are supported (the kernel statically slices the
            # band operand), so ch need not divide th; tw stays 128-mult
            if tw % 128 or ch > th or cw > tw:
                continue
            if _dma_vmem_bytes(h, w, th, tw, rh, rw, 1, mat_b, cw, ch) > budget:
                continue
            variants.append((f"t{th}x{tw}_c{cw}x{ch}", (th, tw), (cw, ch)))

        if args.plan_only:
            row["variants"] = [v[0] for v in variants]
            print("  " + " ".join(row["variants"]), flush=True)
            results.append(row)
            continue

        dense = _blur_fused_dma_impl(
            x, plan, prec, True, dense_tile, (dense_tile[1], dense_tile[0])
        )

        @jax.jit
        def maxdiff(a, b):  # scalar fetch: full frames cost ~50 s RTT
            return jnp.max(jnp.abs(
                a.astype(jnp.int32) - b.astype(jnp.int32)
            ))

        # int8 chunking skips exact int32 zeros: bit-identity required.
        # bf16x3 chunking regroups f32 partial sums: <= 1 count allowed.
        tol = 0 if prec == "int8" else 1
        for name, tile, chunks in variants:
            try:
                got = _blur_fused_dma_impl(
                    x, plan, prec, True, tile, chunks
                )
                d = int(maxdiff(got, dense))
                if d > tol:
                    row[name] = f"MISMATCH max {d}"
                    print(f"  {name}: MISMATCH max {d}", flush=True)
                    continue
                res = time_fn_chained(
                    lambda tile=tile, chunks=chunks: (
                        lambda v: _blur_fused_dma_impl(
                            v, plan, prec, True, tile, chunks
                        )
                    ),
                    x, iters=args.iters, reps=2, name=name, megapixels=mp,
                )
                if res.suspect:
                    row[name] = f"SUSPECT {res.median_ms:.2f}"
                    print(f"  {name}: SUSPECT (noise swamped the chained "
                          f"delta)", flush=True)
                    continue
                row[name] = round(res.median_ms, 2)
                print(f"  {name}: {res.median_ms:.2f} ms "
                      f"({res.mpix_per_s:.0f} MP/s)", flush=True)
            except Exception as exc:
                row[name] = f"ERR {type(exc).__name__}"
                print(f"  {name}: ERR {exc}", flush=True)
        results.append(row)

    if args.plan_only:
        return 0  # never clobber the device artifact with a host-side plan
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
