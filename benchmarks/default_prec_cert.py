"""Certify the single-dot bf16 ("DEFAULT-class") DMA path vs the oracle.

Round-2 verdict item 4: the DEFAULT-precision fused path measured ~34 GP/s
but broke the <=1-count gate at small sigma — "no per-plan certification
exists that would let AUTO harvest the ~1.3x where the gate provably
holds". This sweep maps that boundary for the DMA ``precision="bf16"``
form (2 dots/px): a sigma grid x adversarial content set (uniform random,
binary salt, checkerboards at several scales, hard step edges — the
patterns that sit on rounding boundaries), each case's uint8 output
compared against ``oracle.blur_u8``. Writes
``benchmarks/default_prec_cert.json`` with per-sigma worst errors and the
derived certified boundary; ``utils/hw.py`` embeds the result per device
kind and AUTO only routes bf16 inside it.

Run on the real chip: ``python benchmarks/default_prec_cert.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def patterns(h: int, w: int, seed: int) -> dict[str, np.ndarray]:
    """Adversarial uint8 content (C=3 planar) for rounding-boundary hunts."""
    rng = np.random.default_rng(seed)
    out = {
        "uniform": (rng.random((3, h, w)) * 255).astype(np.uint8),
        "salt": (rng.random((3, h, w)) < 0.5).astype(np.uint8) * 255,
    }
    yy, xx = np.mgrid[:h, :w]
    for p in (1, 3, 8, 31):
        out[f"checker{p}"] = np.broadcast_to(
            (((yy // p) + (xx // p)) % 2 * 255).astype(np.uint8), (3, h, w)
        ).copy()
    step = np.zeros((3, h, w), np.uint8)
    step[:, :, w // 2:] = 255
    step[:, h // 2:, :] ^= 255
    out["step"] = step
    # near-boundary grays: values whose blurred means sit at .5 boundaries
    out["gray127"] = np.full((3, h, w), 127, np.uint8)
    g = out["gray127"].copy()
    g[:, ::2, ::2] = 128
    out["gray127_128"] = g
    return out


def box_oracle_u8(img: np.ndarray, radius: int, passes: int = 2) -> np.ndarray:
    """Exact FastBoxBlur oracle in O(1)/px: sequential reflect-101 box
    passes via f64 cumsum differences.

    Two sequential reflect-101 box passes equal one conv with the folded
    tent taps under the same border (the reflect-101 extension is
    symmetric and symmetric kernels preserve that symmetry, so pass 2's
    re-reflection continues the same infinite extension) — the identity
    ``api.box_blur`` itself relies on. The naive banded oracle at r=300
    cost ~50 CPU-minutes for the sweep; this runs in milliseconds.
    """
    w = 2 * radius + 1

    def box1(a: np.ndarray, axis: int) -> np.ndarray:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (radius, radius)
        ap = np.pad(a, pad, mode="reflect")
        cs = np.cumsum(ap, axis=axis, dtype=np.float64)
        zero = np.zeros_like(np.take(cs, [0], axis=axis))
        cs = np.concatenate([zero, cs], axis=axis)
        hi = np.take(cs, range(w, cs.shape[axis]), axis=axis)
        lo = np.take(cs, range(0, cs.shape[axis] - w), axis=axis)
        return (hi - lo) / w

    out = img.astype(np.float64)
    for _ in range(passes):
        out = box1(out, -1)
        out = box1(out, -2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", nargs=2, type=int, default=[1088, 1920])
    ap.add_argument("--out", default="benchmarks/default_prec_cert.json")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument(
        "--sigmas", type=float, nargs="*",
        default=[1.3, 1.6, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0, 8.0, 10.0, 13.0,
                 16.0, 24.0, 32.0, 48.0, 64.0, 100.0, 150.0, 250.0],
    )
    ap.add_argument(
        "--precision", choices=["bf16", "hybrid"], default="bf16",
        help="which fast DMA rung to certify (hybrid = exact int8 rows + "
             "single-dot bf16 cols)",
    )
    ap.add_argument(
        "--kernel", choices=["gaussian", "box_fast"], default="gaussian",
        help="box_fast: --sigmas are BOX RADII (2 passes folded to "
             "effective tent taps, the FastBoxBlur call-site semantics)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu import oracle
    from blur_algorithms_tpu.ops.plan import make_plan
    from blur_algorithms_tpu.pallas_kernels.fused_dma import (
        blur_fused_u8_dma,
        dma_form_applicable,
    )
    from blur_algorithms_tpu.utils.hw import device_kind

    h, w = args.hw
    pats = patterns(h, w, args.seed)
    rows = []
    for sigma in args.sigmas:
        if args.kernel == "box_fast":
            plan = make_plan(
                (h, w), int(sigma), kernel="box_fast", box_passes=2
            )
        else:
            plan = make_plan((h, w), float(sigma))
        r = max(plan.col.support_radius, plan.row.support_radius)
        if plan.row.support_radius < 1 or plan.col.support_radius < 1:
            rows.append({"sigma": sigma, "radius": r, "skip": "radius 0"})
            continue
        if jax.default_backend() == "tpu" and not dma_form_applicable(
            jnp.uint8, plan, args.precision
        ):
            rows.append({"sigma": sigma, "radius": r, "skip": "dma n/a"})
            continue
        worst = 0
        per_pat = {}
        for name, img in pats.items():
            got = np.asarray(
                blur_fused_u8_dma(
                    jnp.asarray(img), plan, precision=args.precision
                )
            )
            if args.kernel == "box_fast":
                want = box_oracle_u8(img, int(sigma), plan.box_passes)
            else:
                want = np.moveaxis(
                    oracle.blur_u8(np.moveaxis(img, 0, -1), float(sigma)),
                    -1, 0,
                )
            d = int(np.abs(got.astype(int) - want.astype(int)).max())
            per_pat[name] = d
            worst = max(worst, d)
        row = {"sigma": sigma, "radius": r, "max": worst, "per_pattern": per_pat}
        rows.append(row)
        print(json.dumps(row), flush=True)

    measured = [r for r in rows if "max" in r]
    # certified boundary: the smallest radius from which EVERY measured
    # case (this radius and above) passes the gate
    ok_from = None
    for row in sorted(measured, key=lambda r: r["radius"]):
        if all(
            q["max"] <= 1 for q in measured if q["radius"] >= row["radius"]
        ):
            ok_from = row["radius"]
            break
    summary = {
        "backend": jax.default_backend(),
        "device_kind": device_kind(),
        "precision": args.precision,
        "kernel": args.kernel,
        "image": [h, w, 3],
        "patterns": sorted(pats),
        "gate": "max <= 1 vs oracle.blur_u8",
        "cases": rows,
        "certified_min_radius": ok_from,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\ncertified_min_radius: {ok_from}")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
