"""Interleaved A/B: in-kernel-framing vs pre-rotated-HBM fft_mxu form.

Round-5 verdict item 1 (the wide-radius lever, deferred rounds 3-4). The
decomposition at the target geometry (``fft_mxu_framing_decompose.json``:
67 MP r=3328) measured ~16 ms/axis of XLA framing copies around a 34 ms
kernel. The framed form (``fft4step._conv_rows_pallas_framed``) moves the
reflect/zero framing, rotation and crop into VMEM so per-axis HBM traffic
drops to one round trip of the unpadded rows plus thin edge strips.

Interleaved min-of-reps pairs at the wide-radius geometries past/near the
fused crossover (the ``wide_radius.json`` frame), plus a u8-count
accuracy gate of the framed path vs the CPU pocketfft oracle on a corner
patch. Writes ``benchmarks/fft_mxu_framing_ab.json``.

Usage: python benchmarks/fft_mxu_framing_ab.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.fft_mxu import transform_length
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels import fft4step
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    if jax.default_backend() != "tpu":
        print("needs the TPU backend", file=sys.stderr)
        return 2

    h = w = 8192
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((3, h, w)).astype(np.float32) * 255.0)
    mp = 3 * h * w / 1e6
    rows = []
    for sigma in (160.0, 615.0, 1000.0):
        plan = make_plan((h, w), sigma)
        n = transform_length(plan.row)
        assert fft4step.framed_applicable(n), n

        def mk(framed):
            def step(v):
                old = fft4step._FRAMED
                fft4step._FRAMED = framed
                try:
                    return fft4step._blur_fft_mxu_pallas_diff(v, plan)
                finally:
                    fft4step._FRAMED = old

            return step

        row = {"sigma": sigma, "radius": plan.row.support_radius, "n": n}
        for nm, fr in (("old", False), ("framed", True),
                       ("old2", False), ("framed2", True)):
            r = time_fn_chained(
                lambda fr=fr: mk(fr), x, iters=4, reps=3,
                name=f"{nm}-s{sigma}", megapixels=mp,
            )
            row[nm + "_ms"] = round(r.median_ms, 2)
        row["old_ms"] = min(row["old_ms"], row.pop("old2_ms"))
        row["framed_ms"] = min(row["framed_ms"], row.pop("framed2_ms"))
        row["speedup"] = round(row["old_ms"] / row["framed_ms"], 3)
        row["old_mps"] = round(mp / row["old_ms"] * 1e3, 1)
        row["framed_mps"] = round(mp / row["framed_ms"] * 1e3, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # u8-count gate on a corner patch: FFT conv is global, so the gate
    # runs a SMALL frame end to end (same kernel path) vs the oracle
    from blur_algorithms_tpu import oracle

    # (2048, 2048) sigma=340 -> n=4096, inside framed_applicable (the
    # smallest framed geometry), so the gate runs the framed kernel
    img = (rng.random((2048, 2048, 3)) * 255).astype(np.uint8)
    gplan = make_plan((2048, 2048), 340.0)
    planar = jnp.moveaxis(jnp.asarray(img), -1, -3).astype(jnp.float32)
    old_flag = fft4step._FRAMED
    fft4step._FRAMED = True
    try:
        got = np.asarray(
            fft4step._blur_fft_mxu_pallas_diff(planar, gplan)
        )
    finally:
        fft4step._FRAMED = old_flag
    got8 = np.clip(np.floor(got + 0.5), 0, 255).astype(np.uint8)
    want = np.moveaxis(oracle.blur_u8(img, 340.0), -1, 0)
    gate = int(np.abs(got8.astype(int) - want.astype(int)).max())
    out = {"rows": rows, "gate_max_err_u8": gate,
           "gate_shape": [2048, 2048], "gate_sigma": 340.0}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fft_mxu_framing_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"gate_max_err_u8": gate}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
