"""Headline benchmark: megapixels/sec/chip, batched 4K RGB Gaussian blur σ=10.

Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": x, ...}

vs_baseline is against the reference's best engine (pffft, 1-D tiles) at its
closest published size: 4000x2500 in 46.92 ms = 213.2 MP/s on an M3 Pro
12-core (BASELINE.md; py/performance.ipynb pffft[5]).

Timing accounts for the axon tunnel (block_until_ready does not fence; host
round trips cost ~30 ms): N blur steps are chained in one lax.scan reduced
to a scalar and differenced against a 1-step program — RTT and the final
fetch cancel (see utils/timing.time_fn_chained).

Accuracy gate: max abs uint8 error vs the CPU pocketfft oracle on frame 0.
"""

from __future__ import annotations

import json
import sys

import numpy as np

REF_MP_PER_S = 4000 * 2500 / 1e6 / (46.92 / 1e3)  # 213.15 MP/s

H, W, BATCH, SIGMA = 2160, 3840, 4, 10.0


def make_frames(batch: int, h: int, w: int) -> np.ndarray:
    """Structured synthetic 4K RGB frames (sinusoids + noise, per-frame phase)."""
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for b in range(batch):
        base = (
            127
            + 70 * np.sin(xx / (11.0 + b) + b)
            + 50 * np.cos(yy / (17.0 + 2 * b))
            + rng.normal(0, 18, (h, w)).astype(np.float32)
        )
        img = np.stack(
            [base, np.roll(base, 31, axis=0), np.roll(base, 17, axis=1)], axis=0
        )
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)  # (B, C, H, W) planar uint8


def main(gate_floor: float | None = None) -> int:
    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu import oracle
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_blur import blur_fused_u8
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    batch = BATCH if on_tpu else 1
    h, w = (H, W) if on_tpu else (540, 960)  # CPU smoke fallback

    frames = make_frames(batch, h, w)
    plan = make_plan((h, w), SIGMA)
    x = jnp.asarray(frames)

    # the production u8 route: exact-window DMA form on TPU in the
    # small-radius regime (bit-identical to the blocked int8 kernel,
    # ~1.6x instead of 4x input HBM traffic), blocked int8 elsewhere
    from blur_algorithms_tpu.pallas_kernels.fused_dma import (
        blur_fused_u8_dma,
        dma_form_applicable,
    )

    # the production precision ladder: single-dot bf16 inside the
    # device-certified radius region (benchmarks/default_prec_cert.json;
    # sigma=10 -> r=32 is comfortably inside on v5e), else int8 fixed
    # point — exactly what AUTO routes for this plan
    from blur_algorithms_tpu.api import _u8_dma_precision

    prec = _u8_dma_precision(plan)
    use_dma = dma_form_applicable(jnp.uint8, plan, prec)
    engine_name = f"fused/{prec}-dma" if use_dma else "fused/int8"

    def mk():
        if use_dma:
            return lambda v: blur_fused_u8_dma(v, plan, precision=prec)
        return lambda v: blur_fused_u8(v, plan, precision="int8")

    def timed():
        return time_fn_chained(
            mk,
            x,
            iters=16 if on_tpu else 2,
            reps=10 if on_tpu else 2,
            name=engine_name,
            megapixels=batch * h * w / 1e6,
        )

    try:
        result = timed()
    except Exception as exc:  # noqa: BLE001
        if not use_dma:
            raise
        # never lose the round artifact to a DMA-route failure: fall back
        # to the blocked int8 kernel (the portable form) and record that
        print(f"# DMA route failed ({type(exc).__name__}: {exc}); "
              f"falling back to blocked int8", file=sys.stderr)
        use_dma = False
        engine_name = "fused/int8"
        result = timed()

    # accuracy vs CPU pocketfft oracle (frame 0)
    out0 = np.asarray(mk()(x))[0]
    want = oracle.blur_u8(np.moveaxis(frames[0], 0, -1), SIGMA)
    max_err = int(np.abs(out0.astype(int) - np.moveaxis(want, -1, 0).astype(int)).max())
    exact = float((out0 == np.moveaxis(want, -1, 0)).mean())

    value = result.mpix_per_s
    print(
        json.dumps(
            {
                "metric": "megapixels/sec/chip at 4K Gaussian blur (sigma=10); "
                "max abs err vs CPU ref",
                "value": round(value, 1),
                "unit": "MP/s",
                "vs_baseline": round(value / REF_MP_PER_S, 2),
                "max_abs_err_u8": max_err,
                "exact_fraction": round(exact, 5),
                "config": f"batch{batch} {w}x{h} RGB, engine {engine_name}, "
                f"backend {backend}",
                "per_step_ms": round(result.median_ms, 3),
            }
        )
    )
    if gate_floor is not None and on_tpu:
        # perf-regression gate (round-4 verdict item 8): the accuracy
        # grid catches numeric regressions; this catches a silent kernel
        # slowdown. The floor is deliberately conservative — 20 GP/s is
        # ~38% under the 32.2 GP/s canonical capture, safely outside the
        # ±15% tunnel variance band (PERF.md "Headline").
        if value < gate_floor:
            print(
                f"# PERF GATE FAILED: {value:.1f} MP/s < floor "
                f"{gate_floor:.0f} MP/s",
                file=sys.stderr,
            )
            return 1
        print(
            f"# perf gate ok: {value:.1f} >= {gate_floor:.0f} MP/s",
            file=sys.stderr,
        )
    elif gate_floor is not None:
        print("# perf gate skipped (not a TPU backend)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--gate", nargs="?", const=20000.0, default=None, type=float,
        metavar="MP_S_FLOOR",
        help="fail (exit 1) if the TPU headline lands under this floor "
        "(default floor when given bare: 20000 MP/s)",
    )
    sys.exit(main(ap.parse_args().gate))
