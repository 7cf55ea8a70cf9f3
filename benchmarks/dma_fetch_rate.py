"""Isolated DMA fetch-rate probe: one whole-strip copy vs windowed copies.

The aligned-compute A/B (``dma_aligned_ab.json``) refuted the slice-
relayout theory and left window-AREA scaling as the explanation of the
sawtooth cliffs — i.e. the per-window (shp, swp) fetches themselves
dominate the DMA kernel's wall time at ~23% of HBM peak (short strided
bursts: 640-byte rows on a 3840-byte stride). Premise of the strip-fetch
rework: ONE near-contiguous (shp, wp) strip DMA should run much closer
to peak. This kernel-only probe times (a) nbw windowed fetches per
strip, (b) one whole-strip fetch, both doing a trivial store — no band
compute — on the headline geometry. Writes ``benchmarks/dma_fetch_rate.json``.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from blur_algorithms_tpu.utils.timing import time_fn_chained

    # headline-like geometry: padded frame (bc, hp, wp) u8
    bc, hp, wp = 12, 2224, 4096  # batch-4 RGB 4K at r=32, th whole height
    th, tw = 2160, 384
    shp, swp = 2224, 640
    nbw = 10

    x = jnp.zeros((bc, hp, wp), jnp.uint8)

    def windowed(x_hbm, out_ref, win, sem):
        c = pl.program_id(0)

        def get(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[c, pl.ds(0, shp), pl.ds(j * tw, swp)],
                win.at[slot], sem.at[slot],
            )

        get(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < nbw)
            def _():
                get((j + 1) % 2, j + 1).start()

            get(slot, j).wait()
            out_ref[0] = win[slot][:8, :128]
            return _

        jax.lax.fori_loop(0, nbw, body, None, unroll=False)

    def strip(x_hbm, out_ref, buf, sem):
        c = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(0, shp), pl.ds(0, wp)], buf, sem
        )
        cp.start()
        cp.wait()
        out_ref[0] = buf[:8, :128]

    win_call = pl.pallas_call(
        windowed,
        grid=(bc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, hp, wp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, shp, swp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    strip_call = pl.pallas_call(
        strip,
        grid=(bc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, hp, wp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((shp, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    res = {}
    gb_win = bc * nbw * shp * swp / 1e9
    gb_strip = bc * shp * wp / 1e9
    for rnd in range(3):
        for name, call, gb in (("windowed", win_call, gb_win),
                               ("strip", strip_call, gb_strip)):
            t = time_fn_chained(
                lambda call=call: call, x, iters=16, reps=3, name=name
            )
            res.setdefault(name, []).append(t.median_ms)
            print(f"round {rnd} {name}: {t.median_ms:.3f} ms "
                  f"({gb / t.median_ms * 1e3:.0f} GB/s)", flush=True)
    out = {
        "geometry": {"bc": bc, "shp": shp, "swp": swp, "wp": wp, "nbw": nbw},
        "bytes_gb": {"windowed": gb_win, "strip": gb_strip},
        "ms_min": {k: min(v) for k, v in res.items()},
        "gbps": {
            "windowed": gb_win / min(res["windowed"]) * 1e3,
            "strip": gb_strip / min(res["strip"]) * 1e3,
        },
    }
    print(json.dumps(out["gbps"]))
    with open("benchmarks/dma_fetch_rate.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
