"""Certify the SPLIT regime (r ~ 600..3500) like the DMA domain was.

Round-4 verdict item 1: the split regime's hybrid pass 2 routed on a
tightness argument plus 3-radius/2-pattern spot checks; the DMA rung got
a full 9-adversarial-pattern x radius-grid sweep precisely because a
plausible precision argument had already failed once (bf16 at small
sigma). This sweep closes that gap with direct measurement:

* gaussian taps, tall-narrow frames ``(7424, 256)`` with anisotropic
  sigma ``(sigma_y, 10)``: the COLUMN radius — the axis the hybrid
  pass-2 bf16 dot actually runs on — sweeps the whole blocked split
  regime including the previously unmeasured 2500-3500 band, while the
  row axis stays modest (pass 1 is the exact int8 fixed-point form at
  any width, already certified). Narrow frames keep tunnel transfers
  tractable; quantization error is local, not frame-size dependent.
* box/tent taps, ``(2560, 1280)`` frames, support 600..1022 (the
  box_scan crossover caps the split's box regime at ~1024 on v5e).
* both pass-2 forms at every point: the exact int8-e32 digit pipeline
  AND the hybrid single-dot (``_hybrid_cols_ok`` forced per run).
* the HALOED split form (multi-chip per-shard path) at a representative
  per-shard geometry, both forms.

Oracle: ``oracle.blur_planar_fft2`` on the SAME plan + the reference u8
quantize (= ``oracle.blur_u8``); box via the O(1)/px cumsum oracle.
Diffs are computed ON DEVICE against an uploaded oracle plane (scalars
come back over the tunnel, not frames).

The gate-passing ceiling feeds ``DeviceSpec.hybrid_split_cert_max_radius``
(None until this artifact exists; the router keeps the exact e32 pass 2
outside the certified region). Writes ``benchmarks/hybrid_split_cert.json``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from default_prec_cert import box_oracle_u8, patterns  # noqa: E402


def gauss_oracle_u8(img_chw: np.ndarray, plan) -> np.ndarray:
    from blur_algorithms_tpu import oracle

    out = oracle.blur_planar_fft2(img_chw.astype(np.float32), plan)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def run_split(x_dev, plan, hybrid: bool):
    from blur_algorithms_tpu.pallas_kernels import fused_blur

    old = fused_blur._hybrid_cols_ok
    fused_blur._hybrid_cols_ok = (lambda p: hybrid)
    try:
        return fused_blur._blur_fused_split(x_dev, plan, "int8", out_u8=True)
    finally:
        fused_blur._hybrid_cols_ok = old


def device_diff(got_dev, want_np):
    """max |got - want| and exact fraction, reduced on device."""
    import jax.numpy as jnp

    w = jnp.asarray(want_np)
    d = jnp.abs(got_dev.astype(jnp.int32) - w.astype(jnp.int32))
    return int(jnp.max(d)), float(jnp.mean((d == 0).astype(jnp.float32)))


def _flush(rows, pats_g, extra=None):
    """Incremental artifact write: a crash in a later section must not
    lose the measured rows (the round-4 first run lost its 10 passing
    sweep points to a haloed-leg oracle bug)."""
    import jax

    from blur_algorithms_tpu.utils.hw import device_kind

    swept = [r for r in rows if "per_pattern" in r]

    def ceiling(family_rows):
        ok = None
        for row in sorted(family_rows, key=lambda r: r["radius"]):
            if row["max"]["hybrid"] <= 1:
                ok = row["radius"]
            else:
                break  # first failing radius caps the certified ceiling
        return ok

    # per tap family (round-4 advisor finding): the box leg only sweeps
    # to support 1022, so its ceiling must not be pooled with gaussian's
    box_rows = [r for r in swept if r.get("kernel") == "box_fast"]
    gauss_rows = [r for r in swept if r.get("kernel") != "box_fast"]
    summary = {
        "backend": jax.default_backend(),
        "device_kind": device_kind(),
        "gate": "max <= 1 vs pocketfft/cumsum oracle",
        "patterns": sorted(pats_g),
        "cases": rows,
        "e32_worst": max((r["max"]["e32"] for r in swept), default=None),
        "hybrid_split_cert_max_radius": ceiling(gauss_rows),
        "hybrid_split_cert_max_radius_box": ceiling(box_rows),
    }
    with open("benchmarks/hybrid_split_cert.json", "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main() -> int:
    import argparse

    import jax
    import jax.numpy as jnp

    from blur_algorithms_tpu.ops.plan import make_plan

    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="gaussian,box,haloed")
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    seed = 7
    rows = []
    if os.path.exists("benchmarks/hybrid_split_cert.json"):
        with open("benchmarks/hybrid_split_cert.json") as f:
            prior = json.load(f)
        # keep rows of sections not being re-run
        rows = [
            r for r in prior.get("cases", [])
            if (r.get("form") == "haloed_split" and "haloed" not in sections)
            or (r.get("kernel") == "box_fast" and "box" not in sections
                and r.get("form") != "haloed_split")
            or (r.get("kernel") == "gaussian" and r.get("form") is None
                and "gaussian" not in sections)
        ]

    # --- gaussian: tall-narrow cols-radius sweep --------------------------
    HG, WG = 7424, 256
    pats_g = patterns(HG, WG, seed)
    pats_g_dev = (
        {k: jnp.asarray(v) for k, v in pats_g.items()}
        if "gaussian" in sections else {}
    )
    # sigma ~ r / 3.3267 (v5e-measured width rule: r=1863 at sigma=560)
    targets = [665, 1000, 1330, 1800, 2400, 3000, 3450]
    for rt in targets if "gaussian" in sections else []:
        plan = make_plan((HG, WG), (rt / 3.3267, 10.0))
        rh = plan.col.support_radius
        per = {"e32": {}, "hybrid": {}}
        for name, img in pats_g.items():
            want = gauss_oracle_u8(img, plan)
            for form in ("e32", "hybrid"):
                got = run_split(pats_g_dev[name], plan, form == "hybrid")
                mx, exact = device_diff(got, want)
                per[form][name] = mx
                if name == "uniform":
                    per[form]["_exact_uniform"] = round(exact, 5)
        row = {
            "kernel": "gaussian", "shape": [HG, WG], "radius": rh,
            "sigma_y": round(rt / 3.3267, 2),
            "max": {f: max(v for k, v in per[f].items()
                           if not k.startswith("_")) for f in per},
            "per_pattern": per,
        }
        rows.append(row)
        _flush(rows, pats_g)
        print(json.dumps(row["max"] | {"radius": rh}), flush=True)

    # --- box/tent: support 600..1022 --------------------------------------
    HB, WB = 2560, 1280
    pats_b = patterns(HB, WB, seed + 1) if "box" in sections else {}
    pats_b_dev = {k: jnp.asarray(v) for k, v in pats_b.items()}
    for R in (300, 400, 511) if "box" in sections else []:
        plan = make_plan((HB, WB), R, kernel="box_fast", box_passes=2)
        rh = plan.col.support_radius
        per = {"e32": {}, "hybrid": {}}
        for name, img in pats_b.items():
            want = box_oracle_u8(img, R, plan.box_passes)
            for form in ("e32", "hybrid"):
                got = run_split(pats_b_dev[name], plan, form == "hybrid")
                mx, _ = device_diff(got, want)
                per[form][name] = mx
        row = {
            "kernel": "box_fast", "shape": [HB, WB], "box_radius": R,
            "radius": rh,
            "max": {f: max(per[f].values()) for f in per},
            "per_pattern": per,
        }
        rows.append(row)
        _flush(rows, pats_g)
        print(json.dumps(row["max"] | {"radius": rh}), flush=True)

    # --- haloed split (per-shard form), representative geometry -----------
    if "haloed" in sections:
        from numpy.lib.stride_tricks import sliding_window_view

        from blur_algorithms_tpu.pallas_kernels import fused_blur

        rng = np.random.default_rng(seed + 2)
        h_in, w_in, sig = 1024, 512, 210.0  # rh ~ 700: wide per-shard
        plan_h = make_plan((h_in, w_in), (sig, 10.0))
        rh = plan_h.col.support_radius
        rw = plan_h.row.support_radius
        block = (
            rng.random((3, h_in + 2 * rh, w_in)) * 255
        ).astype(np.uint8)
        # oracle: rows conv (reflect-101 on W — np 'reflect' == the
        # unclamped reflect-101 since rw < w) over the WHOLE haloed
        # block, then a VALID cols correlation — the supplied halo rows
        # ARE the column context. Direct sliding-window conv: the
        # rows-only plan's FFT fields are not consistent under the
        # haloed-shape replace (the fused path never reads them).
        blk = block.astype(np.float64)
        padw = np.pad(blk, [(0, 0), (0, 0), (rw, rw)], mode="reflect")
        winw = sliding_window_view(padw, 2 * rw + 1, axis=2)
        y = np.einsum(
            "chwk,k->chw", winw, plan_h.row.taps.astype(np.float64)
        )
        winh = sliding_window_view(y, 2 * rh + 1, axis=1)
        want_h = np.einsum(
            "chwk,k->chw", winh, plan_h.col.taps.astype(np.float64)
        )
        want_h = np.clip(np.floor(want_h + 0.5), 0, 255).astype(np.uint8)
        per = {}
        block_dev = jnp.asarray(block)
        for form in ("e32", "hybrid"):
            old = fused_blur._hybrid_cols_ok
            fused_blur._hybrid_cols_ok = (lambda p, f=form: f == "hybrid")
            try:
                got = fused_blur._blur_fused_haloed_split(
                    block_dev, plan_h, "int8", out_u8=True
                )
            finally:
                fused_blur._hybrid_cols_ok = old
            mx, _ = device_diff(got, want_h)
            per[form] = mx
        rows.append({
            "kernel": "gaussian", "form": "haloed_split",
            "shape": [h_in, w_in], "radius": rh, "max": per,
        })
        print(json.dumps({"haloed": per, "radius": rh}), flush=True)

    summary = _flush(rows, pats_g)
    print(f"\ne32 worst: {summary['e32_worst']}")
    print(f"hybrid_split_cert_max_radius: "
          f"{summary['hybrid_split_cert_max_radius']}")
    print("wrote benchmarks/hybrid_split_cert.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
