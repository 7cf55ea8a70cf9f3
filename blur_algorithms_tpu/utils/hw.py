"""Per-device hardware budgets for routing and tile-search heuristics.

Round 1 hard-coded TPU v5e numbers into the AUTO router and the fused
kernel's tile search (VMEM budget, Mosaic scoped-vmem cap, HBM budgets,
MAC/HBM-byte weighting). On a different TPU generation those constants
would silently mis-route. This module derives every budget from a small
calibration table keyed by ``jax.devices()[0].device_kind``, with the v5e
entry reproducing round 1's measured-good values exactly.

The derivations (ratios of the v5e calibration, scaled by each device's
published HBM / VMEM / bandwidth / peak-bf16 numbers — see the public
"How to Scale Your Model" hardware tables):

* ``wide_vmem_budget``   — tile-search VMEM estimate cap: 110/128 of VMEM.
* ``kernel_vmem_limit``  — Mosaic scoped-vmem cap: VMEM - 1 MiB.
* ``fft_mxu_byte_budget``— whole-frame MXU-FFT intermediates: 10/16 of HBM.
* ``split_hbm_budget``   — two-pass split peak footprint: 11/16 of HBM.
* ``macs_per_hbm_byte``  — effective MXU MACs retired per HBM byte at the
  measured bf16x3 rate (~30 GMAC/ms on v5e vs 819 GB/s -> 37), scaled by
  peak-flops / bandwidth relative to v5e.

Unknown device kinds (including CPU test runs, which exercised the same
constants in round 1) fall back to the v5e entry.

Round 3 adds the ROUTING crossovers (previously module-level v5e
constants): ``auto_fused_max_radius_u8/_f32`` (fused-vs-fft), the
``box_scan_crossover_radius``, and ``dma_max_radius`` — the first three
scaled by flops-per-HBM-byte, the DMA cap by VMEM — plus the bf16
certification boundary (``bf16_cert_min_radius`` / ``bf16_route_min_radius``
/ ``bf16_min_radius``), which is a per-kind MEASUREMENT and deliberately
not scaled.
"""

from __future__ import annotations

import dataclasses
import functools

__all__ = ["DeviceSpec", "budgets", "device_kind"]


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    """Published per-chip numbers + derived budget properties."""

    kind: str
    hbm_bytes: int
    vmem_bytes: int
    hbm_gbps: float  # GB/s
    peak_bf16_tflops: float
    # Smallest support radius at which the single-dot bf16 DMA path is
    # DEVICE-CERTIFIED to hold the <=1-count oracle gate (the
    # ``benchmarks/default_prec_cert.py`` sweep: sigma grid x adversarial
    # content). None = uncertified on this kind -> AUTO never routes bf16.
    # A measurement, not a model — deliberately NOT scaled across kinds.
    bf16_cert_min_radius: int | None = None
    # Smallest radius at which bf16 also WINS on wall clock (below it the
    # DMA form is HBM-bound and int8's tighter numerics cost nothing):
    # v5e single-4K sweep ``benchmarks/bf16_radius_sweep.json`` — int8
    # faster at r=52 (0.212 vs 0.254 ms), bf16 faster from r=105 on
    # (0.390 vs 0.480 ... 1.385 vs 1.655 at r=498). 0 = no perf floor.
    bf16_route_min_radius: int = 0

    @property
    def bf16_min_radius(self) -> int | None:
        """Routing boundary for the bf16 rung: accuracy AND perf floors."""
        if self.bf16_cert_min_radius is None:
            return None
        return max(self.bf16_cert_min_radius, self.bf16_route_min_radius)

    # The HYBRID rung (exact int8 rows + single-dot bf16 cols — strict
    # accuracy superset of bf16, ~1.2-1.4x int8 wherever measured):
    # same two-floor structure, own certification sweep
    # (``benchmarks/hybrid_cert*.json``). None = uncertified.
    # ``hybrid_cert_min_radius_box`` is the BOX/TENT tap family's own
    # measured floor (``hybrid_cert_box.json`` certifies box_fast from
    # support radius 2 on v5e after the round-4 re-anchor; the gaussian
    # sweep's floor must not be applied to taps it never measured —
    # round-3 advisor finding).
    hybrid_cert_min_radius: int | None = None
    hybrid_route_min_radius: int = 0
    hybrid_cert_min_radius_box: int | None = None
    # Largest min-axis support radius at which the SPLIT form's hybrid
    # pass 2 is certified by the wide-regime sweep
    # (``benchmarks/hybrid_split_cert.json``: 9 adversarial patterns x a
    # radius grid spanning the blocked split regime to the fft crossover,
    # gaussian + box taps, int8-e32 and hybrid-split both gated <= 1).
    # None = no wide-regime certification -> the split keeps its exact
    # int8-e32 pass 2. A measurement, not a model — NOT scaled.
    hybrid_split_cert_max_radius: int | None = None
    # The BOX/TENT tap family's OWN measured split ceiling: the split
    # sweep's box leg only measured support 600..1022 on v5e (the
    # box_scan crossover caps box's split regime there in AUTO), so the
    # gaussian ceiling must not be applied to box taps it never measured
    # — a box plan reaching the split through an explicit engine pin
    # would otherwise run hybrid pass 2 in an uncertified band
    # (round-4 advisor finding). None = box keeps exact int8-e32 pass 2.
    hybrid_split_cert_max_radius_box: int | None = None

    @property
    def hybrid_min_radius(self) -> int | None:
        if self.hybrid_cert_min_radius is None:
            return None
        return max(self.hybrid_cert_min_radius, self.hybrid_route_min_radius)

    def hybrid_split_cert_max_radius_for(self, kernel: str) -> int | None:
        """Per-tap-family split-form hybrid ceiling (a measurement)."""
        if kernel == "box_fast":
            return self.hybrid_split_cert_max_radius_box
        return self.hybrid_split_cert_max_radius

    def hybrid_min_radius_for(self, kernel: str) -> int | None:
        """Per-tap-family hybrid floor: box/tent taps use their own
        measured certification floor, not the gaussian sweep's."""
        base = self.hybrid_min_radius
        if base is None:
            return None
        if kernel == "box_fast":
            if self.hybrid_cert_min_radius_box is None:
                return None
            return max(base, self.hybrid_cert_min_radius_box)
        return base

    @property
    def wide_vmem_budget(self) -> int:
        """VMEM cap for the wide-radius fused tile search (v5e: 110 MiB)."""
        return self.vmem_bytes * 110 // 128

    @property
    def kernel_vmem_limit(self) -> int:
        """Mosaic scoped-vmem cap passed to kernels (v5e: 127 MiB)."""
        return self.vmem_bytes - (1 << 20)

    @property
    def fft_mxu_byte_budget(self) -> int:
        """Whole-frame padded-row intermediate budget (v5e: 10 GiB)."""
        return self.hbm_bytes * 10 // 16

    @property
    def split_hbm_budget(self) -> int:
        """Two-pass split form peak-HBM budget (v5e: 11 GiB)."""
        return self.hbm_bytes * 11 // 16

    @property
    def macs_per_hbm_byte(self) -> int:
        """Effective MXU MACs per HBM byte (v5e calibration: 37)."""
        v5e_ratio = 197.0 / 819.0
        ratio = self.peak_bf16_tflops / self.hbm_gbps
        return max(1, round(37 * ratio / v5e_ratio))

    def _scale_by_flops_per_byte(self, v5e_value: int) -> int:
        """Scale a measured v5e crossover radius by flops-per-HBM-byte.

        The routing crossovers below all compare an O(radius)-MACs-per-
        pixel MXU path against a (nearly) radius-independent path whose
        cost is dominated by HBM traffic (prefix scan) or by heavier HBM
        intermediates (the MXU FFT's padded f32 rows). A chip with more
        MACs per HBM byte keeps the O(r) matmul path profitable to a
        proportionally larger radius, so the crossover scales with
        ``peak_bf16_tflops / hbm_gbps`` relative to v5e — exact for the
        v5e calibration point, analytic elsewhere (no other device kind
        was measurable in this repo's environment).
        """
        v5e_ratio = 197.0 / 819.0
        ratio = self.peak_bf16_tflops / self.hbm_gbps
        return max(128, round(v5e_value * ratio / v5e_ratio))

    @property
    def auto_fused_max_radius_u8(self) -> int:
        """AUTO's fused-vs-fft_mxu crossover, uint8 int8-e32 split path.

        Round-5 re-measurement after the in-kernel-framing fft_mxu form
        landed (1.44-1.56x; ``benchmarks/wide_radius_r5.json``, 67 MP
        frame): dead heat at r=1537 (fused 59.8 vs fft 60.4 ms), fft
        clearly ahead by r=2046 (74.0 vs 63.0) -> crossover ~1550
        (was ~3500 against the pre-rotated-HBM fft form).
        """
        return self._scale_by_flops_per_byte(1550)

    @property
    def auto_fused_max_radius_f32(self) -> int:
        """AUTO's fused-vs-fft_mxu crossover for float inputs (bf16x3
        pass 2). Round-5 (``benchmarks/f32_crossover_r5.json``): fused
        42.0 vs framed fft 54.8 ms at r=1024, 70.4 vs 65.8 at r=1537 ->
        crossover ~1400 (was ~2560)."""
        return self._scale_by_flops_per_byte(1400)

    @property
    def auto_fused_max_radius_u8_streamed(self) -> int:
        """The fused-vs-fft crossover when the FFT path would have to
        STRIP-STREAM (whole-frame intermediates over the HBM budget).

        Streaming re-reads strip overlaps and loses the whole-frame
        kernel's amortization, so the banded path stays profitable to a
        much larger radius there: v5e 348 MP at r=2995 measured the
        int16-E split at 341 ms vs the streamed FFT's ~500 (round 3).
        Kept at the pre-framing whole-frame crossover value (the framed
        form speeds strips too, so this is conservative; re-measure at a
        giant point to lower it).
        """
        return self._scale_by_flops_per_byte(3500)

    @property
    def auto_fused_max_radius_f32_streamed(self) -> int:
        """Float-input twin of ``auto_fused_max_radius_u8_streamed``."""
        return self._scale_by_flops_per_byte(2560)

    @property
    def box_scan_crossover_radius(self) -> int:
        """Box blur: widening fused matmuls vs the radius-independent
        Pallas prefix scan (~1 GP/s HBM-bound on v5e; crossover ~1024)."""
        return self._scale_by_flops_per_byte(1024)

    @property
    def auto_sp_min_px(self) -> int:
        """Pixel floor below which AUTO does NOT row(sp)-shard a frame.

        Below it one chip finishes in ~1 ms and the halo-exchange +
        dispatch overhead of a row-sharded step would not amortize
        (v5e calibration: 1<<24 ~ 16.8 MP). The floor tracks the chip's
        small-radius blur throughput, which is HBM-bound, so it scales
        with HBM bandwidth relative to v5e (the time floor it protects
        is roughly constant across kinds).
        """
        return max(1 << 22, round((1 << 24) * self.hbm_gbps / 819.0))

    @property
    def dma_max_radius(self) -> int:
        """Largest support radius served by the exact-window DMA form.

        On v5e the measured win holds through r=515 and the blocked
        split form wins by r=1863 (453 vs 264 ms at 348 MP) -> cap 600.
        The cap is also a VMEM geometry bound — the aligned halo windows
        span ``th + 2*rh`` rows — so it shrinks with VMEM on 16 MiB
        parts (v2/v3) rather than with the flops/byte ratio.
        """
        return max(32, 600 * self.vmem_bytes // (128 * _MIB))


_GIB = 1 << 30
_MIB = 1 << 20

# Published per-chip specs (HBM capacity / VMEM / HBM bandwidth GB/s / peak
# bf16 TFLOP/s). v2/v3 report per-core; jax exposes each core as a device.
# v5e bf16 certification: benchmarks/default_prec_cert.py (2026-08-20,
# 1088x1920, 9 adversarial patterns x sigma 1.3..150): gate failures
# (max 2) only at radius 5 and 9; EVERY measured radius >= 12 holds
# max <= 1 through r=498. Routed boundary 16 = certified 12 plus one
# grid step of margin against the borderline wiggle at r~9.
# v5e hybrid certification (benchmarks/hybrid_cert.json / _box.json,
# 2026-08-20): worst err 1 at EVERY measured radius — gaussian 3..498,
# box/tent support 8..600, no failures anywhere (the exact int8 rows
# remove bf16's small-sigma failures) — and the perf probe shows hybrid
# beats int8 at every radius down to r=4 (hybrid_small_radius.json,
# hybrid_probe.json: 1.2-1.4x), so its route floor is its cert floor.
# v5e split-regime certification (benchmarks/hybrid_split_cert.json,
# round 4, 2026-08-20): 9 adversarial patterns x the blocked split
# regime — gaussian cols radius 664..3451 (tall-narrow frames so the
# cols axis, the one the hybrid pass-2 bf16 dot runs on, sweeps to the
# fft crossover incl. the previously unmeasured 2400-3451 band), box
# support 600..1022, plus the haloed per-shard form — int8-e32 AND
# hybrid pass 2 both worst err 1 at EVERY point, so the certified
# ceiling is the sweep's top radius 3451 (~ the fused-vs-fft crossover;
# past it the split regime ends anyway).
_V5E = DeviceSpec(
    "TPU v5e", 16 * _GIB, 128 * _MIB, 819.0, 197.0,
    bf16_cert_min_radius=16, bf16_route_min_radius=96,
    hybrid_cert_min_radius=3, hybrid_route_min_radius=0,
    # round-4 re-anchor on the fold-variant kernels: the box sweep now
    # measures support radii 2..600 and ALL pass (the round-3 floor of 8
    # was the old sweep's smallest measured radius, not a failure
    # boundary) — hybrid_cert_box.json, 2026-08-20
    hybrid_cert_min_radius_box=2,
    hybrid_split_cert_max_radius=3451,
    # box leg of the same sweep: support 600..1022 all pass (1022 is the
    # sweep's top box point — past it AUTO's box_scan crossover ends the
    # box split regime, so the certified ceiling IS the measured ceiling)
    hybrid_split_cert_max_radius_box=1022,
)

# Unknown device kinds (and CPU/GPU test runs) get v5e's BUDGET numbers —
# VMEM/HBM caps, crossover scaling, tile-search weights, which round 1
# exercised on CPU — but NOT its measured certification boundaries: the
# cert fields are per-kind MEASUREMENTS ("a measurement, not a model"),
# and an unrecognized future chip must run the always-exact int8 rung
# until ``make certify-device`` certifies it, exactly like the known
# non-v5e kinds above (round-4 verdict item 5). CPU test runs never
# route the fast rungs anyway (``dma_form_applicable`` is TPU-only).
_UNKNOWN = dataclasses.replace(
    _V5E,
    bf16_cert_min_radius=None,
    hybrid_cert_min_radius=None,
    hybrid_cert_min_radius_box=None,
    hybrid_split_cert_max_radius=None,
    hybrid_split_cert_max_radius_box=None,
)
_TABLE: tuple[tuple[tuple[str, ...], DeviceSpec], ...] = (
    (("v5 lite", "v5e", "v5litepod"), _V5E),
    (("v6 lite", "v6e", "trillium"),
     DeviceSpec("TPU v6e", 32 * _GIB, 128 * _MIB, 1640.0, 918.0)),
    (("v5p", "v5"),
     DeviceSpec("TPU v5p", 95 * _GIB, 128 * _MIB, 2765.0, 459.0)),
    (("v4",), DeviceSpec("TPU v4", 32 * _GIB, 128 * _MIB, 1228.0, 275.0)),
    (("v3",), DeviceSpec("TPU v3", 16 * _GIB, 16 * _MIB, 450.0, 61.0)),
    (("v2",), DeviceSpec("TPU v2", 8 * _GIB, 16 * _MIB, 350.0, 23.0)),
)


def device_kind() -> str:
    """The backend's device-kind string ('' when no backend is reachable)."""
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return ""


def spec_for_kind(kind: str) -> DeviceSpec:
    """Resolve a device-kind string to its spec (v5e fallback)."""
    k = kind.lower()
    if "tpu" in k or k.startswith("v"):
        for needles, spec in _TABLE:
            if any(n in k for n in needles):
                return spec
    # unknown TPU, CPU/GPU test runs: round 1's budget constants with the
    # measured certification rungs stripped (int8-only until certified)
    return _UNKNOWN


@functools.lru_cache(maxsize=1)
def budgets() -> DeviceSpec:
    """The current backend's budget set (cached; v5e fallback)."""
    return spec_for_kind(device_kind())
