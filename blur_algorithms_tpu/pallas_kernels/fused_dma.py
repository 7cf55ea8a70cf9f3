"""Exact-window DMA form of the fused separable-blur kernel.

The blocked form (``fused_blur.py``) fetches an ``nh x nw`` neighborhood of
whole grid blocks per output tile through standard pipelined BlockSpecs —
simple, but every input byte is read ``nh*nw`` (= 4 in the small-radius
regime) times from HBM, and wide radii split the band matmuls into many
small chunked dots. This form keeps the input in HBM
(``memory_space=ANY``) and streams the EXACT ``(th + 2rh) x (tw + 2rw)``
halo window per tile with manual double-buffered async DMA — input traffic
falls to ``(1 + 2rh/th)(1 + 2rw/tw)``, and the band matmuls run in small
translation-invariant CHUNKS (``_pick_chunks_dma``) so MACs per pixel
track the kernel radius instead of the tile size. Measured 4K batch-4 u8:
the dense-dot form beat the blocked kernel by +7..15% across radii; the
chunked dots then cut r=32 from 2.97 to 1.76 ms (11.3 -> ~18.8 GP/s
headline), bit-identical on the int8 path.

Layout: grid ``(batch*channels, row-strips)``; each grid step loops over
the column tiles of its strip with a two-slot VMEM window buffer — DMA of
window ``j+1`` overlaps the matmuls of window ``j`` (the guide's classic
double-buffering pattern). Band matrices ride constant-index BlockSpecs
(fetched once).

Three precisions, the first two with the same numerics as the blocked
forms:

* ``int8``   — the fixed-point digit pipeline of ``fused_blur._kernel_int8``
  (same quantizer, scales, <=1-count class); uint8 in, uint8 out.
* ``bf16x3`` — hi/lo bfloat16 split dots (lo*lo dropped) for float inputs
  and signed/asymmetric custom taps; uint8 or float32 in, either out.
* ``bf16``   — single-dot DEFAULT-class bf16 band matmuls (2 dots/px, the
  fastest rung); uint8 in only, routed by AUTO strictly inside the
  device-certified sigma region (``_tile_bf16`` docstring).

Production-routed on TPU only (``dma_form_applicable`` rejects other
backends; the blocked form is the portable fallback). Off TPU the
pallas_call lowers through the Pallas interpreter — slow, but it lets the
CPU suite exercise the kernel body (double-buffered DMA loop, chunked band
matmuls, digit pipeline) without a chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blur_algorithms_tpu.ops.band_matmul import band_block_matrix
from blur_algorithms_tpu.ops.pad import reflect_101
from blur_algorithms_tpu.ops.plan import BlurPlan
from blur_algorithms_tpu.pallas_kernels.fused_blur import (
    _hw,
    _quantize_band_int8,
    int8_applicable,
    pick_int8_scale,
)

__all__ = [
    "blur_fused_u8_dma",
    "blur_fused_dma",
    "blur_fused_haloed_dma",
    "dma_form_applicable",
]

# Largest support radius the DMA form serves at all — and, identically,
# the radius up to which its band matmuls run chunked (``_pick_chunks_dma``)
# with tall tile targets (``_pick_tile_dma``), so chunking covers the
# form's whole domain. Calibrated by ``benchmarks/dma_chunk_sweep.py`` on
# v5e (4K batch-4 u8, two independent runs): r=32 dense 2.97 -> 1.76 ms;
# r=95 ~5.0 -> ~3.2; r=165 ~5.8 -> ~4.3; r=332 ~8.9 -> ~6.7; r=515 ~13.0
# -> ~10.3 — chunked (tall tile, ch=24) wins at EVERY measured radius,
# 1.2-1.7x (``benchmarks/dma_chunk_sweep_wide*.json``); v5e cap 600.
# Device-keyed via utils/hw.DeviceSpec.dma_max_radius (scales with VMEM
# on 16 MiB parts; v5e value unchanged).


def _chunk_max_radius() -> int:
    return _hw().dma_max_radius


# Window-buffer slots in the manual DMA pipeline. With 2 (classic double
# buffering) only ONE window fetch is in flight while a window computes;
# at small radii the per-window compute (~2 us) is far shorter than a
# window DMA, so the loop is DMA-latency-bound. k slots keep k-1 fetches
# in flight. The VMEM cost is n_slots * shp * swp * in_bytes per grid
# step (modeled in ``_dma_vmem_bytes``).
_N_WIN_SLOTS = 2

# Round-4 probe knobs, read at TRACE time (fresh plans -> fresh traces —
# the same A/B mechanism as ``_N_WIN_SLOTS``; see dma_slot_sweep.py).
#
# ``_HYBRID_FOLD_SHIFT``: the hybrid rung emits the rows conv R directly
# to bf16 and folds the requant's ``2^-rows_shift`` into the f32 output
# scale — dropping the ``(R + half) >> shift`` integer requant, i.e. two
# int32 VPU ops per E-plane element AND one rounding step (bf16(R) is
# strictly tighter than bf16(round(R >> s))).
#
# ``_HYBRID_ROWS_F32``: accumulate the hybrid rows dots in f32 instead of
# int32 so the digit recombine + bf16 cast chain runs one cast shorter
# (probe only: exactness of the int32 E is not required on this rung —
# the f32 combine's 2^-24 relative round is far inside the bf16 2^-9).
#
# ``_TRUNC_STORE``: quantize the u8 store as clip + truncating cast with
# the half folded in, instead of an explicit floor op — BIT-IDENTICAL:
# after the clip the operand is >= 0, where f32 -> s32 round-toward-zero
# IS floor.
_HYBRID_FOLD_SHIFT = True
_HYBRID_ROWS_F32 = False
_TRUNC_STORE = True

# Round-5 batch gate for the whole-strip splice form (verdict item 3):
# auto-route ``strip=True`` only in the region two independent sessions
# measured it faster — >= 9 flattened planes AND max support radius <= 32
# (the sigma=10 anchor) — see the routing comment in
# ``_blur_fused_dma_impl``. None disables auto-routing entirely.
# v5e measurements; not scaled across kinds (the win is a structural
# DMA-issue property, small either way, and the form is bit-identical).
_STRIP_MIN_PLANES: int | None = 9
_STRIP_MAX_RADIUS = 32

# ``_ALIGNED_COMPUTE``: compute directly on the ALIGNED (shp, swp) window
# buffer instead of slicing the true (sh, sw) halo window out of it,
# folding the (ro, co) offset into the band operands as LEADING ZERO
# ROWS — bit-identical for the integer rungs (added zero terms), <= 1
# count for bf16 (f32 summation-order moves ~1e-5 of pixels by one).
# Motivated by the alignment sawtooth (``dma_align_probe.json``: wall
# time jumps 39-44% when ``co = ceil128(rw) - rw`` wraps to ~124), but
# REFUTED as a win by the interleaved A/B (``dma_aligned_ab.json``,
# round 4): aligned is 10-25% SLOWER at every measured config — the
# extra ``co`` contraction MACs and whole-(shp, swp)-buffer elementwise
# work cost more than the slice, i.e. Mosaic does NOT pay a big rotate
# for the lane-offset slice. The sawtooth cliff instead tracks the
# fetched window AREA (swp jumps a full 128-lane tile when co wraps).
# Kept off as the measured-honest record + for other device kinds.
_ALIGNED_COMPUTE = False

# ``_UNROLL_WINDOWS``: statically unroll the window loop in the windowed
# kernels so the slot indices (j % n_slots) become trace-time constants.
# Hypothesis (round-4 stage ladder, ``dma_stage_fetch.json``): the wall
# time is the SUM of the fetch floor and the compute (0.515 + 0.41 =
# 0.93 measured — zero DMA/compute overlap), possibly because the
# dynamic ``win[slot]`` indices defeat Mosaic's memory disambiguation
# and serialize the prefetch DMA against the compute's VMEM reads.
_UNROLL_WINDOWS = False


def _compute_store(x, j, bw_ref, bh_ref, out_ref, *,
                   th: int, tw: int, sh: int, sw: int, cw: int, ch: int,
                   precision: str, rows_shift: int, cols_scale: int,
                   out_u8: bool, nbw: int, tl: int, in_u8: bool,
                   ro: int = 0, co: int = 0, oc: int = 0):
    """Band-matmul one ``(sh, sw)`` window ``j`` and store its tile.

    ``(ro, co) != (0, 0)`` is the aligned-compute mode: ``x`` is the
    UNSLICED aligned buffer whose true window starts at ``(ro, co)``, and
    the band operands carry matching leading zero rows (bit-identical;
    see ``_ALIGNED_COMPUTE``)."""
    geom = dict(
        tw=tw, th=th, rw=(sw - tw) // 2, rh=(sh - th) // 2, cw=cw, ch=ch,
        ro=ro, co=co,
    )
    if precision == "ablate_fetch":
        # probe only: fetch + loop + the out-block writeback, with the
        # window slice and the per-window tile store reduced to an 8x128
        # touch — isolates the DMA/loop floor from the store-side work.
        out_ref[oc, :8, pl.ds(j * tw, 128)] = x[:8, :128]
        return
    if precision == "ablate_copy":
        # decomposition probe only (benchmarks/dma_stage_decompose.py):
        # window fetch + slice + a trivial u8 tile store — no band work.
        # Content is NOT a blur; never routed.
        outf = x[:th, :tw]
    elif precision == "ablate_rows":
        # probe only: fetch + recentre + the exact int8 rows dots, then a
        # wrapping u8 store of the int32 rows plane — no cols stage.
        r = _rows_int8(x, bw_ref, tw=tw, rw=geom["rw"], cw=cw, co=co)
        outf = (r[:th, :tw] & 255).astype(jnp.uint8)
    elif precision == "int8":
        outf = _tile_int8(
            x, bw_ref, bh_ref, rows_shift=rows_shift,
            cols_scale=cols_scale, **geom,
        )
    elif precision == "hybrid":
        outf = _tile_hybrid(x, bw_ref, bh_ref, rows_shift=rows_shift, **geom)
    elif precision == "bf16":
        outf = _tile_bf16(x, bw_ref, bh_ref, **geom)
    else:
        outf = _tile_bf16x3(x, bw_ref, bh_ref, in_u8=in_u8, **geom)
    if out_u8:
        if outf.dtype != jnp.uint8:  # ablate_* probes store u8 directly
            if _TRUNC_STORE:
                outf = jnp.clip(outf + 0.5, 0.0, 255.5)
            else:
                outf = jnp.clip(jnp.floor(outf + 0.5), 0.0, 255.0)
            outf = outf.astype(jnp.int32).astype(jnp.uint8)
    else:
        outf = outf.astype(jnp.float32)
    if tl in (0, tw):
        out_ref[oc, :, pl.ds(j * tw, tw)] = outf
    elif isinstance(j, int):
        # static window index (the strip form's unrolled loop): resolve
        # the last-window partial store at trace time
        if j < nbw - 1:
            out_ref[oc, :, pl.ds(j * tw, tw)] = outf
        else:
            out_ref[oc, :, pl.ds(j * tw, tl)] = outf[:, :tl]
    else:
        # the out strip is ceil128(w) wide, NOT nbw*tw: the last
        # window writes only its tl valid lanes, so no full-frame
        # crop copy is needed after the kernel
        @pl.when(j < nbw - 1)
        def _():
            out_ref[oc, :, pl.ds(j * tw, tw)] = outf

        @pl.when(j == nbw - 1)
        def _():
            out_ref[oc, :, pl.ds(j * tw, tl)] = outf[:, :tl]


def _kernel(x_hbm, bw_ref, bh_ref, out_ref, win, sem, *,
            sh: int, shp: int, sw: int, swp: int, th: int, tw: int,
            nbw: int, cw: int, ch: int, precision: str, rows_shift: int,
            cols_scale: int, out_u8: bool, ro: int = 0, co: int = 0,
            tl: int = 0, n_slots: int = 2, aligned: bool = False):
    """One row-strip: loop column windows with multi-buffered DMA
    (``n_slots - 1`` window fetches kept in flight)."""
    c = pl.program_id(0)
    i = pl.program_id(1)

    def get_dma(slot, j):
        # DMA slices need tiling-aligned starts/extents (8 sublanes x 128
        # lanes): fetch (shp, swp) >= (sh, sw) and compute on the true
        # window at (ro, co) inside the fetch
        return pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(i * th, shp), pl.ds(j * tw, swp)],
            win.at[slot],
            sem.at[slot],
        )

    for k in range(min(n_slots - 1, nbw)):
        get_dma(k, k).start()

    in_u8 = win.dtype == jnp.uint8

    def body(j, _):
        slot = j % n_slots
        nxt = j + n_slots - 1
        if isinstance(j, int):
            # statically unrolled loop: constant slot indices let Mosaic
            # disambiguate the prefetch DMA's target buffer from the
            # compute's source buffer (see _UNROLL_WINDOWS)
            if nxt < nbw:
                get_dma(nxt % n_slots, nxt).start()
        else:
            @pl.when(nxt < nbw)
            def _():
                get_dma(nxt % n_slots, nxt).start()

        get_dma(slot, j).wait()

        if aligned:
            # compute on the whole aligned buffer; the zero-padded band
            # rows make the (ro, co)-offset exact with no slice relayout
            x, kro, kco = win[slot][:, :], ro, co
        else:
            x = win[slot][ro:ro + sh, co:co + sw]  # true window of the fetch
            kro = kco = 0
        _compute_store(
            x, j, bw_ref, bh_ref, out_ref, th=th, tw=tw, sh=sh, sw=sw,
            cw=cw, ch=ch, precision=precision, rows_shift=rows_shift,
            cols_scale=cols_scale, out_u8=out_u8, nbw=nbw, tl=tl,
            in_u8=in_u8, ro=kro, co=kco,
        )

    if _UNROLL_WINDOWS:
        for j in range(nbw):
            body(j, None)
    else:
        jax.lax.fori_loop(0, nbw, body, None, unroll=False)


def _kernel_strip(x_hbm, top, bot, lb, rb, bw_ref, bh_ref, out_ref,
                  buf, sem, *,
                  sh: int, shp: int, sw: int, swp: int, th: int, tw: int,
                  nbh: int, nbw: int, cw: int, ch: int, precision: str,
                  rows_shift: int, cols_scale: int, out_u8: bool,
                  ro: int, co: int, tl: int,
                  orh: int, orw: int, h8: int, w128: int, wp: int,
                  bc: int, n_slots: int = 2):
    """Whole-strip splice form (round 4): fetch each row strip ONCE.

    The stage decomposition (``benchmarks/dma_stage_decompose.json``)
    showed the windowed direct kernel spends ~80% of its wall time just
    MOVING windows: ~0.80 of 0.99 ms at the headline is fetch + slice +
    store with all band compute ablated, of which only ~0.40 ms is the
    raw DMA bytes (``dma_fetch_rate.json``) — the rest is the per-window
    conditional splice-descriptor chains and the 1.57x horizontal
    overlap re-read (each (shp, swp) window refetches its 2rw+pad halo).

    This form splices the ENTIRE padded row strip ``(shp, wp)`` into
    VMEM with <= 5 DMAs (top / bot full-width rows, then lb + frame +
    rb for the frame rows — the same legs as the HBM assemble, clipped
    to the strip), double-buffered ACROSS GRID STEPS (strip ``k+1``
    prefetches while ``k`` computes; Pallas scratch persists across the
    grid), and runs the column-window loop statically unrolled over the
    in-VMEM strip. Each input byte is read exactly once per strip, the
    splice runs once per strip instead of once per window, and the
    compute slices are the same (ro, co)-offset views as the windowed
    form — outputs are BIT-IDENTICAL (same band operands, same
    accumulation order, same store).

    VMEM cost is ``n_slots * shp * wp * in_b`` for the strips (the
    windowed form held ``n_slots * shp * swp``), so applicability is
    gated by ``_strip_vmem_bytes`` — wide/giant frames keep the windowed
    direct form.
    """
    c = pl.program_id(0)
    i = pl.program_id(1)
    k = c * nbh + i  # linear grid step
    nsteps = bc * nbh
    row_tab, ilo, ihi = _row_splices(nbh, th, orh, shp, h8)
    wr = wp - orw - w128

    def legs(slot, c_, i_, gate):
        """(cond, make-descriptor) DMA legs splicing strip (c_, i_) into
        ``buf[slot]`` — construction deferred into the pl.when branch."""
        ps = []

        def seg(fr0, dr0, fh):
            """Frame rows [fr0, fr0+fh) -> strip rows [dr0, ...): the
            three column pieces lb | frame | rb (full padded width)."""
            return [
                lambda fr0=fr0, dr0=dr0, fh=fh: pltpu.make_async_copy(
                    lb.at[c_, pl.ds(fr0, fh), pl.ds(0, orw)],
                    buf.at[slot, pl.ds(dr0, fh), pl.ds(0, orw)],
                    sem.at[slot, 2],
                ),
                lambda fr0=fr0, dr0=dr0, fh=fh: pltpu.make_async_copy(
                    x_hbm.at[c_, pl.ds(fr0, fh), pl.ds(0, w128)],
                    buf.at[slot, pl.ds(dr0, fh), pl.ds(orw, w128)],
                    sem.at[slot, 3],
                ),
                lambda fr0=fr0, dr0=dr0, fh=fh: pltpu.make_async_copy(
                    rb.at[c_, pl.ds(fr0, fh), pl.ds(0, wr)],
                    buf.at[slot, pl.ds(dr0, fh), pl.ds(orw + w128, wr)],
                    sem.at[slot, 4],
                ),
            ]

        for i0, (topseg, frame_seg, botseg) in row_tab.items():
            cond = gate & (i_ == i0)
            if topseg is not None:
                sr, hg = topseg
                ps.append((cond, lambda sr=sr, hg=hg: pltpu.make_async_copy(
                    top.at[c_, pl.ds(sr, hg), pl.ds(0, wp)],
                    buf.at[slot, pl.ds(0, hg), pl.ds(0, wp)],
                    sem.at[slot, 0],
                )))
            for mk in seg(*frame_seg):
                ps.append((cond, mk))
            if botseg is not None:
                dr, hg = botseg
                ps.append((cond, lambda dr=dr, hg=hg: pltpu.make_async_copy(
                    bot.at[c_, pl.ds(0, hg), pl.ds(0, wp)],
                    buf.at[slot, pl.ds(dr, hg), pl.ds(0, wp)],
                    sem.at[slot, 1],
                )))
        if ihi > ilo:
            # plain interior strips: full-height frame rows, start
            # clamped in 8-sublane units so the descriptor stays legal
            # when the branch is off
            rsafe = jnp.clip(
                i_ * (th // 8) - orh // 8, 0, max((h8 - shp) // 8, 0)
            ) * 8
            cond = gate & (i_ >= ilo) & (i_ < ihi)
            for mk in seg(rsafe, 0, shp):
                ps.append((cond, mk))
        return ps

    def start(slot, c_, i_, gate):
        for cond, mk in legs(slot, c_, i_, gate):
            pl.when(cond)(lambda mk=mk: mk().start())

    def wait(slot, c_, i_, gate):
        for cond, mk in legs(slot, c_, i_, gate):
            pl.when(cond)(lambda mk=mk: mk().wait())

    slot = k % n_slots
    always = k >= 0
    start(slot, c, i, always & (k == 0))  # prime the first strip
    # prefetch the NEXT grid step's strip into the other slot
    k1 = k + 1
    c1 = jnp.minimum(k1 // nbh, bc - 1)
    i1 = k1 % nbh
    start((k + 1) % n_slots, c1, i1, k1 < nsteps)
    wait(slot, c, i, always)

    in_u8 = buf.dtype == jnp.uint8
    for j in range(nbw):  # static unroll: every slice start is static
        x = buf[slot][ro:ro + sh, j * tw + co : j * tw + co + sw]
        _compute_store(
            x, j, bw_ref, bh_ref, out_ref, th=th, tw=tw, sh=sh, sw=sw,
            cw=cw, ch=ch, precision=precision, rows_shift=rows_shift,
            cols_scale=cols_scale, out_u8=out_u8, nbw=nbw, tl=tl,
            in_u8=in_u8,
        )


def _row_splices_thin(nsteps, th, orh, h8):
    """Splice table for ``th``-tall fetches of the padded rows
    ``[k*th, (k+1)*th)`` (the resident form: shp == th may be SMALLER
    than the ``orh`` top strip, so — unlike ``_row_splices`` — a fetch
    can lie entirely inside ``top`` or ``bot`` and edge reads need their
    own source offsets). Returns ``(special, ilo, ihi)``; ``special``
    maps step -> ``[(kind, src_row0, dst_row0, height), ...]`` with kind
    in {top, frame, bot}; all starts/heights are multiples of 8."""
    special = {}
    for k0 in range(nsteps):
        rs, re = k0 * th - orh, k0 * th - orh + th
        if 0 <= rs and re <= h8:
            continue
        segs = []
        if rs < 0:  # padded rows [0, orh) live in `top`
            segs.append(("top", k0 * th, 0, min(-rs, th)))
        f0, f1 = max(rs, 0), min(re, h8)
        if f1 > f0:
            segs.append(("frame", f0, f0 - rs, f1 - f0))
        if re > h8:  # padded rows >= orh + h8 live in `bot`
            b0 = max(rs - h8, 0)
            segs.append(("bot", b0, max(h8 - rs, 0), re - h8 - b0))
        special[k0] = segs
    ilo = max((k0 + 1 for k0 in special if k0 * th < orh), default=0)
    ihi = min((k0 for k0 in special if k0 * th - orh + th > h8),
              default=nsteps)
    return special, ilo, ihi


def _resident_geometry(
    h: int, w: int, th: int, rh: int, rw: int, cwr: int
) -> tuple[int, int, int, int, int, int, int, int, int, int]:
    """Aligned geometry of the rows-resident form: edge-strip offsets,
    ring warmup depth, and the padded strip width (wide enough for the
    last rows chunk's ``krp`` lane load AND the lb|frame|rb legs)."""
    orh = -(-rh // 8) * 8
    orw = -(-rw // 128) * 128
    ro, co = orh - rh, orw - rw
    wout = -(-w // 128) * 128
    kr = co + cwr + 2 * rw          # true rows contraction length
    krp = -(-kr // 128) * 128       # aligned lane extent per chunk load
    wp = max(wout - cwr + krp, orw + (w // 128) * 128 + 128)
    npre = -(-(orh + rh) // th)     # warmup steps: npre*th >= orh + rh
    nbh = -(-h // th)
    return orh, orw, ro, co, wout, kr, krp, wp, npre, nbh


def _resident_vmem_bytes(
    h: int, w: int, th: int, rh: int, rw: int, in_b: int, out_b: int,
    cwr: int, ch: int, lc: int, shift_ring: bool = True,
) -> int:
    """VMEM bytes for one grid step of the resident kernel (both rungs
    put 2 bytes/px in the ring: bf16, or the two int8 digit planes)."""
    orh, orw, ro, co, wout, kr, krp, wp, npre, nbh = _resident_geometry(
        h, w, th, rh, rw, cwr
    )
    P = npre + 1
    return (
        (P if shift_ring else 2 * P) * th * wout * 2  # rows-output ring
        + 2 * th * wp * in_b         # double-buffered input strips
        + th * wp * in_b             # the recentred int8 strip value
        + 2 * th * wout * out_b      # double-buffered out blocks
        + kr * cwr * 2               # rows band digits / bf16 stack
        + (ro + ch + 2 * rh) * ch * 4
        + (ro + ch + 2 * rh) * lc * 8   # cols window load + dot temps
        + th * krp * 2               # rows chunk slice + dot temps
        + (4 << 20)                  # slack (Mosaic temporaries)
    )


def _resident_applicable(
    h: int, w: int, th: int, rh: int, rw: int, in_b: int, out_b: int,
    precision: str, rows_prepadded: bool, cwr: int = 128, ch: int = 120,
    lc: int = 768, shift_ring: bool = True,
) -> bool:
    """True when the rows-resident form serves this geometry: u8 input,
    an int8-rows rung (the ring stores the rows conv as bf16 / digit
    planes), real vertical work, and the ring + strip buffers fitting
    the VMEM budget."""
    if rows_prepadded or h < 8 or w < 128 or th % 8 or th < 8:
        return False
    if precision not in ("int8", "hybrid") or in_b != 1:
        return False
    if rh < 1 or h < th:
        return False
    lc = min(lc, -(-w // 128) * 128)
    return _resident_vmem_bytes(
        h, w, th, rh, rw, in_b, out_b, cwr, min(ch, th), lc, shift_ring
    ) <= _hw().wide_vmem_budget


def _pick_tile_resident(plan: BlurPlan, precision: str,
                        out_b: int = 1) -> int | None:
    """Strip height for the resident form: the tallest VMEM-feasible
    ``th`` in [120, 560] (taller strips amortize the MXU band loads of
    the rows dots over more activation rows and halve per-step fixed
    costs — the measured A/B trend is monotone in th; the shift ring
    grows only ~2*th beyond its orh+rh floor), preferring heights that
    divide H exactly within the feasible band."""
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    cwr, ch = _pick_chunks_dma(256, 128, rh, rw, precision)
    fits = [
        t for t in range(560, 112, -8)
        if _resident_applicable(h, w, t, rh, rw, 1, out_b, precision,
                                False, cwr, min(ch, t))
    ]
    if not fits:
        return None
    best = fits[0]
    for t in fits:
        if t >= best - 48 and h % t == 0:
            return t
    return best


def _dma_kernel_call_resident(
    x: jnp.ndarray,
    plan: BlurPlan,
    precision: str,
    out_u8: bool,
    th: int,
    cwr: int,
    ch: int,
    lc: int = 768,
    shift_ring: bool = True,
) -> jnp.ndarray:
    """Rows-resident pallas_call on the ORIGINAL ``(bc, h, w)`` frame ->
    uncropped ``(bc, nbh*th, wout)`` — see ``_kernel_resident``."""
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    orh, orw, ro, co, wout, kr, krp, wp, npre, nbh = _resident_geometry(
        h, w, th, rh, rw, cwr
    )
    bc = x.shape[0]
    nsteps = npre + nbh
    h8, w128 = (h // 8) * 8, (w // 128) * 128
    hp = nsteps * th
    wr = wp - orw - w128
    lc = min(lc, wout)

    top, bot, _hb = _topbot_strips(x, rh, rw, orh, orw, hp, wp)
    lbs, rbs = _lr_borders(x, rw, orw, wr)
    bw, bh, rows_shift, cols_scale = _band_operands(
        plan, precision, cwr, ch, co=co, ro=ro
    )
    P = npre + 1
    nring = P * th if shift_ring else 2 * P * th
    if precision == "int8":
        ring_spec = pltpu.VMEM((2, nring, wout), jnp.int8)
    else:
        ring_spec = pltpu.VMEM((nring, wout), jnp.bfloat16)

    mat = lambda shape: pl.BlockSpec(
        shape, (lambda c, k: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_resident, th=th, wp=wp, wout=wout, cwr=cwr, kr=kr,
            krp=krp, ch=ch, lc=lc, npre=npre, nsteps=nsteps,
            precision=precision, rows_shift=rows_shift,
            cols_scale=cols_scale, out_u8=out_u8, ro=ro, co=co, orh=orh,
            orw=orw, h8=h8, w128=w128, rh=rh, rw=rw, bc=bc,
            shift_ring=shift_ring,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_hw().kernel_vmem_limit
        ),
        grid=(bc, nsteps),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5 + [
            mat(bw.shape),
            mat(bh.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wout),
            lambda c, k: (c, jnp.clip(k - npre, 0, nbh - 1), 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bc, nbh * th, wout), jnp.uint8 if out_u8 else jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th, wp), x.dtype),
            pltpu.VMEM((th, wp), jnp.int8),
            ring_spec,
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, top, bot, lbs, rbs, bw, bh)
    return out


def _kernel_resident(x_hbm, top, bot, lb, rb, bw_ref, bh_ref, out_ref,
                     buf, xcs, ring, sem, *,
                     th: int, wp: int, wout: int, cwr: int, kr: int,
                     krp: int, ch: int, lc: int, npre: int, nsteps: int,
                     precision: str, rows_shift: int, cols_scale: int,
                     out_u8: bool, ro: int, co: int, orh: int, orw: int,
                     h8: int, w128: int, rh: int, rw: int, bc: int,
                     shift_ring: bool = True):
    """Rows-resident full-width form (round-5 verdict item 4).

    The windowed/strip forms refetch the ``2rh`` vertical halo of every
    row strip from HBM and RECOMPUTE its rows-pass output (at the 348 MP
    sweep point that is a 1.43x rows redundancy and a ~5x input-traffic
    ratio — ``benchmarks/giant_decompose.json``). This form walks the
    frame top-to-bottom in full-width strips of ``th`` NEW rows per grid
    step and keeps the rows-pass output RESIDENT in a VMEM ring across
    steps, so

    * every input byte is fetched from HBM exactly once (3-5 splice DMAs
      per strip: lb | frame | rb plus top/bot edge strips — the same
      legs as the strip form, but ``th`` tall instead of ``th + 2rh``),
    * every rows-pass value is computed exactly once, and
    * the cols pass consumes the ring with NO HBM round trip of the
      intermediate (the round-trip the old split form paid, 101 ms at
      this point).

    Ring protocol: ``P = npre + 1`` segments of ``th`` rows each, with
    ``npre = ceil((orh + rh) / th)`` warmup steps per channel. Step
    ``k`` rows-passes padded frame rows ``[k*th, (k+1)*th)`` and writes
    them DOUBLE (segment ``k % P`` and its ``+P`` twin in a ``2P``-
    segment buffer), so the sliding cols window — which starts at
    segment ``(k+1) % P`` and spans ``P`` segments — is always
    CONTIGUOUS: no ring wrap-around dots, no per-step shift copies (a
    shift variant moves ``(P-1)*th*wout`` bytes per step; the double
    write costs only one extra ``th*wout`` store). Output strip
    ``i = k - npre`` stores once the window is full.

    Bit-identity: the rows chunks contract the ``co``-zero-folded band
    against lane-ALIGNED slices and the cols chunks the ``ro``-folded
    band against 8-aligned ring slices — the ``_ALIGNED_COMPUTE`` fold
    argument (zero taps contribute exact zeros, int32 accumulation is
    order-free, the f32 cols dot keeps its term order), so outputs are
    BIT-IDENTICAL to the windowed direct form at the same (cw, ch)
    policy. Lane blocks of ``lc`` use the clamped-start trick (the last
    block recomputes a few identical lanes) — stores are idempotent.

    Reference anchor: the engine family this serves is the
    pocketfft-backed wide-sigma path (/root/reference/Source.cpp:429-570)
    at its largest published geometry (py/performance.ipynb pffft[45],
    24000x14500 = 1728.56 ms).
    """
    c = pl.program_id(0)
    k = pl.program_id(1)
    g = c * nsteps + k  # linear grid step, for cross-step prefetch
    P = npre + 1
    row_tab, ilo, ihi = _row_splices_thin(nsteps, th, orh, h8)
    wr = wp - orw - w128

    def legs(slot, c_, k_, gate):
        """(cond, make-descriptor) DMA legs splicing the ``th`` NEW
        padded rows ``[k_*th, (k_+1)*th)`` into ``buf[slot]``."""
        ps = []

        def seg(fr0, dr0, fh):
            return [
                lambda fr0=fr0, dr0=dr0, fh=fh: pltpu.make_async_copy(
                    lb.at[c_, pl.ds(fr0, fh), pl.ds(0, orw)],
                    buf.at[slot, pl.ds(dr0, fh), pl.ds(0, orw)],
                    sem.at[slot, 2],
                ),
                lambda fr0=fr0, dr0=dr0, fh=fh: pltpu.make_async_copy(
                    x_hbm.at[c_, pl.ds(fr0, fh), pl.ds(0, w128)],
                    buf.at[slot, pl.ds(dr0, fh), pl.ds(orw, w128)],
                    sem.at[slot, 3],
                ),
                lambda fr0=fr0, dr0=dr0, fh=fh: pltpu.make_async_copy(
                    rb.at[c_, pl.ds(fr0, fh), pl.ds(0, wr)],
                    buf.at[slot, pl.ds(dr0, fh), pl.ds(orw + w128, wr)],
                    sem.at[slot, 4],
                ),
            ]

        for k0, segs in row_tab.items():
            cond = gate & (k_ == k0)
            for kind, s0, d0, hg in segs:
                if kind == "top":
                    ps.append((cond, lambda s0=s0, d0=d0, hg=hg:
                               pltpu.make_async_copy(
                                   top.at[c_, pl.ds(s0, hg), pl.ds(0, wp)],
                                   buf.at[slot, pl.ds(d0, hg),
                                          pl.ds(0, wp)],
                                   sem.at[slot, 0],
                               )))
                elif kind == "bot":
                    ps.append((cond, lambda s0=s0, d0=d0, hg=hg:
                               pltpu.make_async_copy(
                                   bot.at[c_, pl.ds(s0, hg), pl.ds(0, wp)],
                                   buf.at[slot, pl.ds(d0, hg),
                                          pl.ds(0, wp)],
                                   sem.at[slot, 1],
                               )))
                else:  # frame piece: lb | frame | rb column splice
                    for mk in seg(s0, d0, hg):
                        ps.append((cond, mk))
        if ihi > ilo:
            rsafe = jnp.clip(
                k_ * (th // 8) - orh // 8, 0, max((h8 - th) // 8, 0)
            ) * 8
            cond = gate & (k_ >= ilo) & (k_ < ihi)
            for mk in seg(rsafe, 0, th):
                ps.append((cond, mk))
        return ps

    def start(slot, c_, k_, gate):
        for cond, mk in legs(slot, c_, k_, gate):
            pl.when(cond)(lambda mk=mk: mk().start())

    def wait(slot, c_, k_, gate):
        for cond, mk in legs(slot, c_, k_, gate):
            pl.when(cond)(lambda mk=mk: mk().wait())

    slot = g % 2
    start(slot, c, k, g == 0)  # prime the first strip
    g1 = g + 1
    c1 = jnp.minimum(g1 // nsteps, bc - 1)
    k1 = g1 % nsteps
    start((g + 1) % 2, c1, k1, g1 < bc * nsteps)
    wait(slot, c, k, g >= 0)

    f32 = jnp.float32

    def dot(a, b, acc):
        return jax.lax.dot_general(
            a, b, ((((0,), (0,))), ((), ())), preferred_element_type=acc
        )

    # ---- rows pass: th new rows -> the ring
    # Two ring protocols: ``shift_ring`` writes at the STATIC tail
    # position npre*th and block-shifts the window down one segment at
    # the end of every step ((npre+1)*th rows total — the smaller ring
    # buys TALLER strips, whose rows dots amortize the MXU band loads
    # over more activation rows); the double-write protocol writes each
    # segment at (k % P)*th AND its +P twin in a 2P ring (no shift
    # copies, dynamic offsets, twice the footprint).
    # (offsets are computed in 8-sublane / 128-lane units so Mosaic can
    # statically prove tiling divisibility — the jsafe/rsafe trick)
    a0 = npre * th if shift_ring else ((k % P) * (th // 8)) * 8
    if precision == "ablate_fetch":
        # probe only: DMA legs + loop + a touch store — the fetch floor
        out_ref[0, :8, pl.ds(0, 128)] = buf[slot][:8, :128]
        return
    # recentre the WHOLE strip once into the int8 staging scratch (a
    # per-chunk recentre would redo the 2rw overlap ~10x, and Mosaic has
    # no dynamic_slice on values — ref slices with pl.ds are fine)
    xcs[:, :] = jax.lax.bitcast_convert_type(
        buf[slot][:, :] ^ jnp.uint8(128), jnp.int8
    )

    def rows_chunk(kk, _):
        xs = xcs[:, pl.ds(kk * cwr, krp)][:, :kr]
        r = (
            jax.lax.dot_general(
                xs, bw_ref[0][:kr], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) * 128
            + jax.lax.dot_general(
                xs, bw_ref[1][:kr], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
        if precision in ("hybrid", "ablate_rows"):
            y = r.astype(f32).astype(jnp.bfloat16)  # fold-shift form
            ring[pl.ds(a0, th), pl.ds(kk * cwr, cwr)] = y
            if not shift_ring:
                ring[pl.ds(a0 + P * th, th), pl.ds(kk * cwr, cwr)] = y
        else:  # exact int8 digit pipeline: store the E digits
            e = (r + (1 << (rows_shift - 1))) >> rows_shift
            e1 = (e + 64) >> 7
            e0 = (e - e1 * 128).astype(jnp.int8)
            e1 = e1.astype(jnp.int8)
            ring[0, pl.ds(a0, th), pl.ds(kk * cwr, cwr)] = e1
            ring[1, pl.ds(a0, th), pl.ds(kk * cwr, cwr)] = e0
            if not shift_ring:
                ring[0, pl.ds(a0 + P * th, th), pl.ds(kk * cwr, cwr)] = e1
                ring[1, pl.ds(a0 + P * th, th), pl.ds(kk * cwr, cwr)] = e0
        return 0

    jax.lax.fori_loop(0, wout // cwr, rows_chunk, 0, unroll=False)

    # ---- cols pass + store (window full once the warmup is done)
    base = 0 if shift_ring else (((k + 1) % P) * (th // 8)) * 8
    nkl = -(-wout // lc)

    @pl.when(k >= npre)
    def _():
        if precision == "ablate_rows":
            # probe only: fetch + rows dots + ring writes (+ shift), no
            # cols stage — a touch store keeps the out block written
            out_ref[0, :8, pl.ds(0, 128)] = (
                ring[:8, :128].astype(jnp.int32).astype(out_ref.dtype)
            )
            return
        for m0 in range(0, th, ch):
            chm = min(ch, th - m0)
            kl = ro + chm + 2 * rh

            if precision == "hybrid":
                b0 = bh_ref[0][:kl, :chm]
                inv = 1.0 / (127.0 * float(1 << rows_shift))

                def lane_blk(j, _, m0=m0, chm=chm, kl=kl, b0=b0, inv=inv):
                    l0 = jnp.minimum(
                        j * (lc // 128), (wout - lc) // 128
                    ) * 128
                    ys = ring[pl.ds(base + m0, kl), pl.ds(l0, lc)]
                    o = dot(b0, ys, f32) * inv + 128.0
                    _store_res(out_ref, o, m0, chm, l0, lc, out_u8)
                    return 0

                jax.lax.fori_loop(0, nkl, lane_blk, 0, unroll=False)
            else:
                b0 = bh_ref[0][:kl, :chm]
                b1 = bh_ref[1][:kl, :chm]
                inv = 1.0 / (127.0 * cols_scale)

                def lane_blk(j, _, m0=m0, chm=chm, kl=kl, b0=b0, b1=b1,
                             inv=inv):
                    l0 = jnp.minimum(
                        j * (lc // 128), (wout - lc) // 128
                    ) * 128
                    s1 = ring[0, pl.ds(base + m0, kl), pl.ds(l0, lc)]
                    s0 = ring[1, pl.ds(base + m0, kl), pl.ds(l0, lc)]
                    p1 = dot(b0, s1, jnp.int32)
                    p23 = dot(b0, s0, jnp.int32) + dot(b1, s1, jnp.int32)
                    p4 = dot(b1, s0, jnp.int32)
                    o = (
                        p1.astype(f32) * (16384.0 * inv)
                        + p23.astype(f32) * (128.0 * inv)
                        + p4.astype(f32) * inv
                        + 128.0
                    )
                    _store_res(out_ref, o, m0, chm, l0, lc, out_u8)
                    return 0

                jax.lax.fori_loop(0, nkl, lane_blk, 0, unroll=False)

    if shift_ring:
        # slide the window down one segment; ascending static block
        # copies are safe (each dst segment sits below the next src)
        for p in range(npre):
            s0, s1 = p * th, (p + 1) * th
            if precision in ("hybrid", "ablate_rows"):
                ring[s0:s1, :] = ring[s1 : s1 + th, :]
            else:
                ring[0, s0:s1, :] = ring[0, s1 : s1 + th, :]
                ring[1, s0:s1, :] = ring[1, s1 : s1 + th, :]


def _store_res(out_ref, o, m0, chm, l0, lc, out_u8):
    """Round/cast + store one (chm, lc) cols block of the resident form
    (same rounding path as ``_compute_store``)."""
    if out_u8:
        if _TRUNC_STORE:
            o = jnp.clip(o + 0.5, 0.0, 255.5)
        else:
            o = jnp.clip(jnp.floor(o + 0.5), 0.0, 255.0)
        o = o.astype(jnp.int32).astype(jnp.uint8)
    else:
        o = o.astype(jnp.float32)
    out_ref[0, pl.ds(m0, chm), pl.ds(l0, lc)] = o


def _store_tile(out_ref, outf, j, *, tw: int, nbw: int, tl: int,
                out_u8: bool):
    """Round/cast + store one (th, tw) tile at window column ``j``."""
    if out_u8:
        if _TRUNC_STORE:
            outf = jnp.clip(outf + 0.5, 0.0, 255.5)
        else:
            outf = jnp.clip(jnp.floor(outf + 0.5), 0.0, 255.0)
        outf = outf.astype(jnp.int32).astype(jnp.uint8)
    else:
        outf = outf.astype(jnp.float32)
    if tl in (0, tw):
        out_ref[0, :, pl.ds(j * tw, tw)] = outf
    else:
        @pl.when(j < nbw - 1)
        def _():
            out_ref[0, :, pl.ds(j * tw, tw)] = outf

        @pl.when(j == nbw - 1)
        def _():
            out_ref[0, :, pl.ds(j * tw, tl)] = outf[:, :tl]


def _kernel_pipe(x_hbm, bw_ref, bh_ref, out_ref, win, sem, rbuf, *,
                 sh: int, shp: int, sw: int, swp: int, th: int, tw: int,
                 nbw: int, cw: int, ch: int, rows_shift: int,
                 cols_scale: int, out_u8: bool, ro: int = 0, co: int = 0,
                 tl: int = 0, n_slots: int = 2):
    """Software-pipelined int8 strip: rows(j) and cols(j-1) share a block.

    Hypothesis under test (PERF.md "where the headline millisecond
    goes"): the plain loop's per-window chain recentre -> rows dots ->
    digit ops -> cols dots serializes VPU elementwise work against MXU
    dots. Here iteration j computes the MXU-heavy rows stage of window
    ``j`` AND the VPU-heavy cols stage of window ``j-1`` (independent
    chains, rows output staged through a 2-slot VMEM buffer), giving
    Mosaic's scheduler two overlappable instruction streams per block.
    Bit-identical to ``_kernel``: the same ops run in the same per-window
    order, only the loop grouping changes.
    """
    c = pl.program_id(0)
    i = pl.program_id(1)

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(i * th, shp), pl.ds(j * tw, swp)],
            win.at[slot],
            sem.at[slot],
        )

    # the prologue consumes window 0 below (its rows stage runs before the
    # loop), so it must also start window 1's fetch — the plain kernel's
    # body(0) does that; here the loop begins at j=1
    for k in range(min(n_slots, nbw)):
        get_dma(k % n_slots, k).start()

    rw = (sw - tw) // 2
    rh = (sh - th) // 2

    def rows(slot):
        x = win[slot][ro:ro + sh, co:co + sw]
        return _rows_int8(x, bw_ref, tw=tw, rw=rw, cw=cw)

    def cols_store(j, r):
        outf = _cols_int8(
            r, bh_ref, rows_shift=rows_shift, cols_scale=cols_scale,
            tw=tw, th=th, rh=rh, ch=ch,
        )
        _store_tile(out_ref, outf, j, tw=tw, nbw=nbw, tl=tl, out_u8=out_u8)

    get_dma(0, 0).wait()
    rbuf[0] = rows(0)

    def body(j, _):
        slot = j % n_slots

        @pl.when(j + n_slots - 1 < nbw)
        def _():
            get_dma((j + n_slots - 1) % n_slots, j + n_slots - 1).start()

        get_dma(slot, j).wait()
        rbuf[j % 2] = rows(slot)
        cols_store(j - 1, rbuf[(j - 1) % 2])

    jax.lax.fori_loop(1, nbw, body, None, unroll=False)
    cols_store(nbw - 1, rbuf[(nbw - 1) % 2])


def _col_splices(nbw, tw, orw, swp, w128):
    """Static column splice table for the direct kernel.

    Window ``j`` fetches frame columns ``[j*tw - orw, j*tw - orw + swp)``
    (the frame region is ``[0, w128)``; ``lb`` holds padded cols left of
    it, ``rb`` right of it). Returns ``(special, jlo, jhi)``: ``special``
    maps straddling window index -> segments
    ``(kind, src_col0, dst_col0, width)`` with kind in {lb, frame, rb}
    and src_col0 in that strip's own coordinates; ``[jlo, jhi)`` are the
    plain interior windows (a single in-bounds frame read). All starts
    and widths are multiples of 128 by construction."""
    special = {}
    for j0 in range(nbw):
        s = j0 * tw - orw
        e = s + swp
        if 0 <= s and e <= w128:
            continue
        segs = []
        if s < 0:
            segs.append(("lb", j0 * tw, 0, -s))
        f0, f1 = max(s, 0), min(e, w128)
        segs.append(("frame", f0, f0 - s, f1 - f0))
        if e > w128:
            segs.append(("rb", 0, f1 - s, e - w128))
        special[j0] = segs
    jlo = max((j0 + 1 for j0 in special if j0 * tw < orw), default=0)
    jhi = min((j0 for j0 in special if j0 * tw - orw + swp > w128),
              default=nbw)
    return special, jlo, jhi


def _row_splices(nbh, th, orh, shp, h8):
    """Static row splice table (the vertical analog of ``_col_splices``).

    Strip ``i`` fetches frame rows ``[i*th - orh, i*th - orh + shp)``;
    the frame region is ``[0, h8)``, ``top``/``bot`` hold the padded rows
    above/below it. Returns ``(special, ilo, ihi)``: ``special`` maps
    straddling strip index -> ``(top_seg, frame_seg, bot_seg)`` where
    top/bot segs are ``(src_row0, height)`` / ``(dst_row0, height)`` or
    None and frame_seg is ``(fr0, dr0, fh)``. Unlike columns, a strip
    may touch BOTH top and bot (``nbh == 1`` always does) — they ride
    separate semaphores. All starts/heights are multiples of 8."""
    special = {}
    for i0 in range(nbh):
        rs = i0 * th - orh
        re = rs + shp
        if 0 <= rs and re <= h8:
            continue
        topseg = (i0 * th, -rs) if rs < 0 else None
        f0, f1 = max(rs, 0), min(re, h8)
        frame = (f0, f0 - rs, f1 - f0)
        botseg = (f1 - rs, re - h8) if re > h8 else None
        special[i0] = (topseg, frame, botseg)
    ilo = max((i0 + 1 for i0 in special if i0 * th < orh), default=0)
    ihi = min((i0 for i0 in special if i0 * th - orh + shp > h8),
              default=nbh)
    return special, ilo, ihi


def _kernel_direct(x_hbm, top, bot, lb, rb, bw_ref, bh_ref, out_ref,
                   win, sem, *,
                   sh: int, shp: int, sw: int, swp: int, th: int, tw: int,
                   nbh: int, nbw: int, cw: int, ch: int, precision: str,
                   rows_shift: int, cols_scale: int, out_u8: bool,
                   ro: int, co: int, tl: int,
                   orh: int, orw: int, h8: int, w128: int,
                   n_slots: int = 2, aligned: bool = False, nch: int = 1):
    """No-assemble form: every window is spliced in VMEM.

    Instead of fetching from a pre-assembled padded frame (a full-frame
    HBM read+write), each ``(shp, swp)`` window is built from a few DMAs
    with identical contents: plain interior windows read the ORIGINAL
    frame in one piece, and every window/strip whose fetch straddles the
    frame region's boundary gets a STATIC splice from the thin ``top`` /
    ``bot`` / ``lb`` / ``rb`` edge strips (``_col_splices`` /
    ``_row_splices`` enumerate them at trace time; wide radii can make
    several windows per side straddle). Interior windows therefore read
    every input byte exactly the window overlap ratio with NO
    whole-frame assemble copy in front.

    Semaphores: top rides sem 0, bot sem 1, the (<= 2) column segments
    of each frame piece sems 2/3 — a window needing lb AND rb at once is
    gated to the assemble form (``_direct_applicable``). All splice
    starts/extents are multiples of the (8, 128) tiling by construction.

    ``nch > 1`` is the CHANNEL-FOLDED variant (round-5 verdict item 2):
    the grid's first axis walks frames instead of planes and every DMA
    leg carries a leading ``pl.ds(c * nch, nch)`` channel extent — one
    descriptor moves the window across all ``nch`` contiguous channel
    planes (same bytes, 1/nch the descriptor chain against the measured
    81% window-movement floor, ``dma_stage_ladder_r4.json``). The window
    buffer gains a channel dim and the compute loops the planes
    statically, storing into a ``(nch, th, wout)`` out block.
    """
    c = pl.program_id(0)
    i = pl.program_id(1)
    col_tab, jlo, jhi = _col_splices(nbw, tw, orw, swp, w128)
    row_tab, ilo, ihi = _row_splices(nbh, th, orh, shp, h8)

    def _src_at(src, rows, cols):
        if nch > 1:
            return src.at[pl.ds(c * nch, nch), rows, cols]
        return src.at[c, rows, cols]

    def _win_at(slot, rows, cols):
        if nch > 1:
            return win.at[slot, pl.ds(0, nch), rows, cols]
        return win.at[slot, rows, cols]

    def copies(slot, j):
        # (cond, make-descriptor) pairs — construction is deferred into
        # the pl.when branch so only the branch that fires builds (and
        # uses) its descriptor. Straddling windows/strips compare j/i
        # against Python constants; plain interiors share one clamped
        # dynamic read.
        def pieces(fr0, dr0, fh):
            """Column splice of one (fh)-tall frame piece read from
            frame rows [fr0, fr0 + fh) into window rows [dr0, ...)."""

            def seg_copy(kind, sc, dc, wd, semk):
                src = {"lb": lb, "rb": rb, "frame": x_hbm}[kind]
                return lambda: pltpu.make_async_copy(
                    _src_at(src, pl.ds(fr0, fh), pl.ds(sc, wd)),
                    _win_at(slot, pl.ds(dr0, fh), pl.ds(dc, wd)),
                    sem.at[slot, semk],
                )

            ps = []
            for j0, segs in col_tab.items():
                for k, (kind, sc, dc, wd) in enumerate(segs):
                    ps.append((j == j0, seg_copy(kind, sc, dc, wd, 2 + k)))
            if jhi > jlo:
                # plain interior windows read the frame in one piece;
                # the start is clamped (in 128-lane units, so Mosaic can
                # prove it divisible by the tiling) so the descriptor
                # stays legal when the branch is off
                jsafe = jnp.clip(
                    j * (tw // 128) - orw // 128,
                    0, max((w128 - swp) // 128, 0),
                ) * 128
                ps.append(
                    ((j >= jlo) & (j < jhi), lambda: pltpu.make_async_copy(
                        _src_at(x_hbm, pl.ds(fr0, fh), pl.ds(jsafe, swp)),
                        _win_at(slot, pl.ds(dr0, fh), pl.ds(0, swp)),
                        sem.at[slot, 2],
                    ))
                )
            return ps

        cps = []
        for i0, (topseg, frame_seg, botseg) in row_tab.items():
            if topseg is not None:
                sr, hg = topseg
                cps.append((i == i0, lambda sr=sr, hg=hg:
                            pltpu.make_async_copy(
                                _src_at(top, pl.ds(sr, hg),
                                        pl.ds(j * tw, swp)),
                                _win_at(slot, pl.ds(0, hg), pl.ds(0, swp)),
                                sem.at[slot, 0],
                            )))
            for cond, mk in pieces(*frame_seg):
                cps.append(((i == i0) & cond, mk))
            if botseg is not None:
                dr, hg = botseg
                cps.append((i == i0, lambda dr=dr, hg=hg:
                            pltpu.make_async_copy(
                                _src_at(bot, pl.ds(0, hg),
                                        pl.ds(j * tw, swp)),
                                _win_at(slot, pl.ds(dr, hg), pl.ds(0, swp)),
                                sem.at[slot, 1],
                            )))
        if ihi > ilo:
            # plain interior strips: one full-window frame read, start
            # clamped in 8-sublane units (same legality trick as jsafe)
            rsafe = jnp.clip(
                i * (th // 8) - orh // 8, 0, max((h8 - shp) // 8, 0)
            ) * 8
            for cond, mk in pieces(rsafe, 0, shp):
                cps.append(((i >= ilo) & (i < ihi) & cond, mk))
        return cps

    def start(slot, j):
        for cond, mk in copies(slot, j):
            pl.when(cond)(lambda mk=mk: mk().start())

    def wait(slot, j):
        for cond, mk in copies(slot, j):
            pl.when(cond)(lambda mk=mk: mk().wait())

    for k in range(min(n_slots - 1, nbw)):
        start(k, k)

    in_u8 = win.dtype == jnp.uint8

    def body(j, _):
        slot = j % n_slots
        nxt = j + n_slots - 1
        if isinstance(j, int):
            # statically unrolled: constant slot indices (_UNROLL_WINDOWS)
            if nxt < nbw:
                start(nxt % n_slots, nxt)
        else:
            @pl.when(nxt < nbw)
            def _():
                start(nxt % n_slots, nxt)

        wait(slot, j)

        for cc in range(nch):
            if aligned:
                # whole aligned buffer + zero-padded band rows:
                # bit-identical, no per-window slice relayout (see
                # _ALIGNED_COMPUTE; stale slack lanes are u8-finite and
                # killed by the zero taps)
                x = (win[slot, cc][:, :] if nch > 1
                     else win[slot][:, :])
                kro, kco = ro, co
            else:
                x = (win[slot, cc][ro:ro + sh, co:co + sw] if nch > 1
                     else win[slot][ro:ro + sh, co:co + sw])
                kro = kco = 0
            _compute_store(
                x, j, bw_ref, bh_ref, out_ref, th=th, tw=tw, sh=sh,
                sw=sw, cw=cw, ch=ch, precision=precision,
                rows_shift=rows_shift, cols_scale=cols_scale,
                out_u8=out_u8, nbw=nbw, tl=tl, in_u8=in_u8, ro=kro,
                co=kco, oc=cc,
            )

    if _UNROLL_WINDOWS:
        for j in range(nbw):
            body(j, None)
    else:
        jax.lax.fori_loop(0, nbw, body, None, unroll=False)


def _rows_int8(x, bw_ref, *, tw: int, rw: int, cw: int,
               acc_f32: bool = False, co: int = 0):
    """Rows stage of the fixed-point pipeline: u8 window -> int32 rows
    conv (same arithmetic/order as inside ``_tile_int8``).

    ``acc_f32`` (hybrid-rung probe only) accumulates the int8 dots in f32
    so the digit recombine needs no int32 -> f32 cast downstream; the
    combine's 2^-24 relative round is far inside the rung's bf16 2^-9 —
    NOT legal for the exact digit pipeline, which needs the int32 E.

    ``co`` (aligned-compute mode): ``x`` is the UNSLICED aligned window
    whose true content starts at lane ``co``; the band operands carry
    ``co`` leading zero rows, so each chunk contracts the lane-ALIGNED
    slice ``[k0, k0 + co + c + 2rw)`` with identical (bit-exact) sums —
    no per-window lane-rotate relayout (see ``_ALIGNED_COMPUTE``)."""
    # recentre u8 -> int8 as one narrow VPU op: (v ^ 0x80) reinterpreted
    # as int8 IS v - 128 exactly (top-bit flip == offset-binary decode)
    xc = jax.lax.bitcast_convert_type(x ^ jnp.uint8(128), jnp.int8)
    acc_ty = jnp.float32 if acc_f32 else jnp.int32
    hi_w = 128.0 if acc_f32 else 128

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=acc_ty
        )

    # chunked band matmuls (contraction co + cw + 2rw per chunk); a tail
    # chunk (tw % cw != 0) uses a static slice of the same band matrix —
    # band matrices are translation-invariant, so bw[:co + cwk + 2rw,
    # :cwk] IS the (cwk)-wide (zero-row-padded) band matrix
    rs = []
    for k0 in range(0, tw, cw):
        cwk = min(cw, tw - k0)
        xs = xc[:, k0 : k0 + co + cwk + 2 * rw]
        rs.append(
            dot(xs, bw_ref[0][: co + cwk + 2 * rw, :cwk], ((1,), (0,)))
            * hi_w
            + dot(xs, bw_ref[1][: co + cwk + 2 * rw, :cwk], ((1,), (0,)))
        )
    return jnp.concatenate(rs, axis=1) if len(rs) > 1 else rs[0]


def _tile_int8(x, bw_ref, bh_ref, *, rows_shift: int, cols_scale: int,
               tw: int, th: int, rw: int, rh: int, cw: int, ch: int,
               ro: int = 0, co: int = 0):
    """Fixed-point digit pipeline on one (sh, sw) u8 window -> (th, tw) f32.

    The band matmuls run in translation-invariant CHUNKS of ``cw`` output
    lanes (rows) / ``ch`` output sublanes (cols): every chunk multiplies
    the same small ``(c + 2r, c)`` band matrix against a sliding slice of
    the window, so MACs per output pixel drop from the dense
    ``tw + 2r`` to ``c + 2r`` while the accumulated int32 arithmetic stays
    BIT-IDENTICAL (the skipped terms are exact zeros). ``cw == tw`` /
    ``ch == th`` degenerates to the single dense dot.
    """
    r = _rows_int8(x, bw_ref, tw=tw, rw=rw, cw=cw, co=co)
    return _cols_int8(
        r, bh_ref, rows_shift=rows_shift, cols_scale=cols_scale,
        tw=tw, th=th, rh=rh, ch=ch, ro=ro,
    )


def _cols_int8(r, bh_ref, *, rows_shift: int, cols_scale: int,
               tw: int, th: int, rh: int, ch: int, ro: int = 0):
    """Cols stage: int32 rows conv -> (th, tw) f32 (digit split + dots)."""

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.int32
        )

    # width-independent 14-bit intermediate E = 127*(conv - 128)
    # (int16 digit-split was tried for narrower VPU ops: Mosaic rejects
    # 16-bit arithmetic shifts)
    e = (r + (1 << (rows_shift - 1))) >> rows_shift
    e1 = (e + 64) >> 7
    e0 = (e - e1 * 128).astype(jnp.int8)
    e1 = e1.astype(jnp.int8)

    # cols pass: digit products against the (ch + 2rh, ch) column chunks
    # (tail chunks slice the band operand, as in the rows pass)
    p1s, p23s, p4s = [], [], []
    for m0 in range(0, th, ch):
        chm = min(ch, th - m0)
        s1 = e1[m0 : m0 + ro + chm + 2 * rh, :]
        s0 = e0[m0 : m0 + ro + chm + 2 * rh, :]
        b0 = bh_ref[0][: ro + chm + 2 * rh, :chm]
        b1 = bh_ref[1][: ro + chm + 2 * rh, :chm]
        p1s.append(dot(b0, s1, ((0,), (0,))))
        p23s.append(
            dot(b0, s0, ((0,), (0,)))
            + dot(b1, s1, ((0,), (0,)))
        )
        p4s.append(dot(b1, s0, ((0,), (0,))))
    cat = lambda ps: jnp.concatenate(ps, axis=0) if len(ps) > 1 else ps[0]
    p1, p23, p4 = cat(p1s), cat(p23s), cat(p4s)

    inv = 1.0 / (127.0 * cols_scale)
    return (
        p1.astype(jnp.float32) * (16384.0 * inv)
        + p23.astype(jnp.float32) * (128.0 * inv)
        + p4.astype(jnp.float32) * inv
        + 128.0
    )


def _tile_hybrid(x, bw_ref, bh_ref, *, rows_shift: int,
                 tw: int, th: int, rw: int, rh: int, cw: int, ch: int,
                 ro: int = 0, co: int = 0):
    """int8 rows + single-dot bf16 cols: the digit pipeline skipped.

    The rows stage is the EXACT fixed-point form (int8 dots, int32 E
    intermediate — bit-identical to ``_tile_int8``'s rows); the cols
    stage rounds the rows conv to bfloat16 once and runs ONE dot per
    chunk against the bf16 column band (hi half only). Total 3 int8/bf16
    dots (~1.5 bf16-equivalents) and roughly half the per-window VPU
    elementwise work of the full digit pipeline; the only precision
    losses are the rows-conv -> bf16 round (<= 2^-9 relative, ~0.25
    counts) and the column taps' bf16 round — a strict accuracy SUPERSET
    of the full-bf16 rung (whose rows are also rounded), so the bf16
    certification region covers it.

    Round 4 (``_HYBRID_FOLD_SHIFT``): the requant shift is folded into
    the f32 output scale — y = bf16(R) with R = 127*2^s*(conv - 128)
    exact int32, out = (Bh_bf16 . y) / (127*2^s) + 128. One bf16
    rounding instead of the legacy integer requant + bf16 round
    (strictly tighter), and the E-plane VPU chain loses the add + shift.
    """
    f32 = jnp.float32

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=f32
        )

    r = _rows_int8(
        x, bw_ref, tw=tw, rw=rw, cw=cw, co=co,
        acc_f32=_HYBRID_ROWS_F32 and _HYBRID_FOLD_SHIFT,
    )
    if _HYBRID_FOLD_SHIFT:
        y = r.astype(f32).astype(jnp.bfloat16)
        inv = 1.0 / (127.0 * float(1 << rows_shift))
    else:
        e = (r + (1 << (rows_shift - 1))) >> rows_shift
        y = e.astype(f32).astype(jnp.bfloat16)
        inv = 1.0 / 127.0

    dims_c = ((0,), (0,))
    outs = []
    for m0 in range(0, th, ch):
        chm = min(ch, th - m0)
        sl = slice(m0, m0 + ro + chm + 2 * rh)
        b0 = bh_ref[0][: ro + chm + 2 * rh, :chm]
        outs.append(dot(b0, y[sl], dims_c))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return out * inv + 128.0


def _tile_bf16x3(x, bw_ref, bh_ref, *, in_u8: bool,
                 tw: int, th: int, rw: int, rh: int, cw: int, ch: int,
                 ro: int = 0, co: int = 0):
    """bf16 hi/lo split dots on one (sh, sw) window -> (th, tw) f32.

    Same numerics as ``fused_blur._kernel``'s bf16x3 path: uint8-valued
    inputs are exact in bfloat16; float inputs add an x_lo term on the
    rows pass; the cols pass splits its f32 intermediate and drops lo*lo.
    Band matmuls run in translation-invariant chunks (see ``_tile_int8``);
    the f32 accumulation drops the dense form's exact-zero terms, which
    only tightens the error.
    """
    f32 = jnp.float32

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=f32
        )

    dims_r = ((1,), (0,))
    xf = (
        x.astype(jnp.int32).astype(f32) if x.dtype == jnp.uint8
        else x.astype(f32)
    )
    x_hi = xf.astype(jnp.bfloat16)
    x_lo = (
        None if in_u8 else (xf - x_hi.astype(f32)).astype(jnp.bfloat16)
    )
    ys = []
    for k0 in range(0, tw, cw):
        cwk = min(cw, tw - k0)
        sl = slice(k0, k0 + co + cwk + 2 * rw)
        w0 = bw_ref[0][: co + cwk + 2 * rw, :cwk]
        w1 = bw_ref[1][: co + cwk + 2 * rw, :cwk]
        yk = dot(x_hi[:, sl], w0, dims_r) + dot(x_hi[:, sl], w1, dims_r)
        if x_lo is not None:
            yk = yk + dot(x_lo[:, sl], w0, dims_r)
        ys.append(yk)
    y = jnp.concatenate(ys, axis=1) if len(ys) > 1 else ys[0]

    dims_c = ((0,), (0,))
    y_hi = y.astype(jnp.bfloat16)
    y_lo = (y - y_hi.astype(f32)).astype(jnp.bfloat16)
    outs = []
    for m0 in range(0, th, ch):
        chm = min(ch, th - m0)
        sl = slice(m0, m0 + ro + chm + 2 * rh)
        b0 = bh_ref[0][: ro + chm + 2 * rh, :chm]
        b1 = bh_ref[1][: ro + chm + 2 * rh, :chm]
        outs.append(
            dot(b0, y_hi[sl], dims_c)
            + dot(b0, y_lo[sl], dims_c)
            + dot(b1, y_hi[sl], dims_c)
        )
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _tile_bf16(x, bw_ref, bh_ref, *,
               tw: int, th: int, rw: int, rh: int, cw: int, ch: int,
               ro: int = 0, co: int = 0):
    """Single-dot bf16 ("DEFAULT-class") band matmuls: 2 dots per pixel.

    The fastest precision rung: rows pass ``dot(x_hi, w_hi)`` and cols
    pass ``dot(b_hi, y_hi)`` only — no lo-compensation terms (bf16x3 runs
    5, int8 6-at-2x-rate ~ 3 bf16-equivalents). uint8 inputs are exact in
    bfloat16; the dropped terms are the band matrices' lo halves (<= 2^-9
    relative per tap) and the f32 intermediate's lo half (<= 2^-9
    relative, ~0.25 counts at 255 scale). The combined error breaks the
    <=1-count oracle gate at SMALL sigma (peaky taps; measured max 2 on
    the blocked DEFAULT form, PERF.md) but holds above a certified sigma
    boundary — AUTO only routes here inside the device-certified region
    (``benchmarks/default_precision_cert.json``, ``utils/hw.DeviceSpec``).
    uint8 input only (float inputs would silently drop 8 mantissa bits).
    Band refs reuse the bf16x3 stacked (hi, lo) operands; the lo plane is
    simply never read.
    """
    f32 = jnp.float32

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=f32
        )

    dims_r = ((1,), (0,))
    x_hi = x.astype(jnp.int32).astype(f32).astype(jnp.bfloat16)
    ys = []
    for k0 in range(0, tw, cw):
        cwk = min(cw, tw - k0)
        sl = slice(k0, k0 + co + cwk + 2 * rw)
        w0 = bw_ref[0][: co + cwk + 2 * rw, :cwk]
        ys.append(dot(x_hi[:, sl], w0, dims_r))
    y = jnp.concatenate(ys, axis=1) if len(ys) > 1 else ys[0]

    dims_c = ((0,), (0,))
    y_hi = y.astype(jnp.bfloat16)
    outs = []
    for m0 in range(0, th, ch):
        chm = min(ch, th - m0)
        sl = slice(m0, m0 + ro + chm + 2 * rh)
        b0 = bh_ref[0][: ro + chm + 2 * rh, :chm]
        outs.append(dot(b0, y_hi[sl], dims_c))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _align_geometry(
    th: int, tw: int, rh: int, rw: int, rows_prepadded: bool = False
) -> tuple[int, int, int, int, int, int, int, int]:
    """DMA-aligned window geometry for one (tile, radius) choice.

    Mosaic requires DMA slice starts AND extents divisible by the tiling
    (8 sublanes x 128 lanes). Fetch starts are ``(i*th, j*tw)`` — aligned
    because ``th % 8 == tw % 128 == 0`` — so the padded frame must hold
    the original at an aligned offset ``(orh, orw) = (ceil8(rh),
    ceil128(rw))``; the true ``(sh, sw)`` halo window then sits at
    ``(ro, co) = (orh - rh, orw - rw)`` inside each aligned
    ``(shp, swp)`` fetch.

    ``rows_prepadded``: the input already carries its ``rh`` halo rows on
    each side (the multi-chip per-shard case — rows came over ICI), so
    the data is placed at row 0 and strip ``i``'s window starts exactly
    at row ``i*th``: ``orh = rh`` conceptually, ``ro = 0``.
    """
    orh = rh if rows_prepadded else -(-rh // 8) * 8
    orw = -(-rw // 128) * 128
    ro, co = orh - rh, orw - rw
    sh, sw = th + 2 * rh, tw + 2 * rw
    shp = -(-(ro + sh) // 8) * 8
    swp = -(-(co + sw) // 128) * 128
    return orh, orw, ro, co, sh, sw, shp, swp


def _topbot_strips(
    x: jnp.ndarray, rh: int, rw: int, orh: int, orw: int, hp: int, wp: int
) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """The thin horizontal strips of the virtual padded frame.

    ``top`` is padded rows ``[0, orh)`` (alignment slack zeros + the
    clamped reflect-101 rows), ``bot`` is rows ``[orh + h8, hp)`` (the
    original tail rows past ``h8``, the reflected bottom rows, then the
    trailing zero slack) — both full ``wp`` wide with reflect-101 columns
    at offset ``orw - rw``. Shared by the assemble form (which DMAs them
    into a padded frame) and the direct kernel (which splices them into
    each window)."""
    bc, h, w = x.shape
    h8 = (h // 8) * 8
    rb = min(rh, h - 1)

    def colmap(blk):
        # (bc, n, w) -> (bc, n, wp): clamped reflect-101 cols at offset co
        blk = reflect_101(blk, [(rw, rw)], axes=[-1])
        return jnp.pad(
            blk, [(0, 0), (0, 0), (orw - rw, wp - (orw - rw) - blk.shape[-1])]
        )

    top = colmap(jnp.flip(x[:, 1 : rb + 1, :], axis=1))
    top = jnp.pad(top, [(0, 0), (orh - rb, 0), (0, 0)])
    hb = hp - orh - h8
    bot = colmap(
        jnp.concatenate(
            [x[:, h8:, :], jnp.flip(x[:, h - 1 - rb : h - 1, :], axis=1)],
            axis=1,
        )
    )
    bot = jnp.pad(bot, [(0, 0), (0, hb - bot.shape[1]), (0, 0)])
    return top, bot, hb


def _lr_borders(
    x: jnp.ndarray, rw: int, orw: int, wr: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The thin vertical border strips of the virtual padded frame over
    rows ``[0, h8)``: ``left`` is padded cols ``[0, orw)`` (zero slack +
    clamped reflect-101), ``right`` is padded cols ``[orw + w128, wp)``
    (the original tail cols past ``w128``, the reflected right cols,
    then trailing zero slack). Shared by the assemble form and the
    direct kernel's edge windows."""
    bc, h, w = x.shape
    h8, w128 = (h // 8) * 8, (w // 128) * 128
    rcb = min(rw, w - 1)
    left = jnp.flip(x[:, :h8, 1 : rcb + 1], axis=2)
    left = jnp.pad(left, [(0, 0), (0, 0), (orw - rcb, 0)])
    right = jnp.concatenate(
        [x[:, :h8, w128:], jnp.flip(x[:, :h8, w - 1 - rcb : w - 1], axis=2)],
        axis=2,
    )
    right = jnp.pad(right, [(0, 0), (0, 0), (0, wr - right.shape[2])])
    return left, right


# The strip form's window loop is statically unrolled (every in-VMEM
# slice start must be a trace-time constant); cap the unroll so compile
# time stays bounded — geometries past it keep the windowed direct form.
_STRIP_MAX_NBW = 32


def _strip_vmem_bytes(
    h: int, w: int, th: int, tw: int, rh: int, rw: int,
    in_b: int, mat_b: int, cw: int, ch: int, out_b: int,
    n_slots: int = 2,
) -> int:
    """VMEM bytes for one grid step of the whole-strip kernel: like
    ``_dma_vmem_bytes`` but the input buffers hold full (shp, wp) strips
    (double-buffered across grid steps) instead of (shp, swp) windows."""
    _, _, _, _, sh, _, shp, swp = _align_geometry(th, tw, rh, rw)
    nbw = -(-w // tw)
    wp = (nbw - 1) * tw + swp
    return (
        n_slots * shp * wp * in_b
        + (cw + 2 * rw) * cw * mat_b
        + (ch + 2 * rh) * ch * mat_b
        + sh * tw * 10
        + th * tw * 16
        + 2 * th * min(nbw * tw, -(-w // 128) * 128) * out_b
    )


def _strip_applicable(
    h: int, w: int, th: int, tw: int, rh: int, rw: int,
    in_b: int, out_b: int, precision: str, rows_prepadded: bool,
) -> bool:
    """True when the whole-strip splice kernel serves this geometry:
    tile-aligned tiles, every strip keeps a non-empty frame piece (the
    ``_row_splices`` classes then cover it), a bounded static window
    unroll, and the (shp, wp) strip buffers fitting the VMEM budget."""
    if rows_prepadded or h < 8 or w < 128 or th % 8 or tw % 128:
        return False
    nbh, nbw = -(-h // th), -(-w // tw)
    if nbw > _STRIP_MAX_NBW:
        return False
    orh, orw, ro, co, sh, sw, shp, swp = _align_geometry(th, tw, rh, rw)
    h8 = (h // 8) * 8
    for i0 in range(nbh):
        rs = i0 * th - orh
        if min(rs + shp, h8) <= max(rs, 0):
            return False  # degenerate: no frame rows in this strip
    mat_b = 2 if precision == "int8" else 4
    cwc, chc = _pick_chunks_dma(th, tw, rh, rw, precision)
    return _strip_vmem_bytes(
        h, w, th, tw, rh, rw, in_b, mat_b, cwc, chc, out_b
    ) <= _hw().wide_vmem_budget


def _direct_applicable(
    h: int, w: int, th: int, tw: int, rh: int, rw: int,
    rows_prepadded: bool,
) -> bool:
    """True when the no-assemble direct kernel serves this geometry.

    Straddling windows/strips get static splices (``_col_splices`` /
    ``_row_splices``), so the only hard gates left are: at least two
    column windows, no window needing the left AND right border strips
    at once (it would need a third column semaphore), and every window /
    strip keeping a non-empty frame piece. Everything else — wide radii,
    ragged multi-strip grids, several straddlers per side — runs direct;
    the assemble form remains for what's gated here."""
    if rows_prepadded or h < 8 or w < 128:
        return False
    if tw % 128 or th % 8:
        # the splice arithmetic (jsafe/rsafe clamps, segment offsets)
        # assumes tile-aligned tiles; the policy tiles always are, but
        # tile= is a public kwarg
        return False
    nbh, nbw = -(-h // th), -(-w // tw)
    if nbw < 2:
        return False
    orh, orw, ro, co, sh, sw, shp, swp = _align_geometry(th, tw, rh, rw)
    h8, w128 = (h // 8) * 8, (w // 128) * 128
    for j0 in range(nbw):
        s = j0 * tw - orw
        e = s + swp
        if s < 0 and e > w128:
            return False  # lb + frame + rb would need a 3rd column sem
        if min(e, w128) <= max(s, 0):
            return False  # degenerate: no frame columns in this window
    for i0 in range(nbh):
        rs = i0 * th - orh
        re = rs + shp
        if min(re, h8) <= max(rs, 0):
            return False  # degenerate: no frame rows in this strip
    return True


def _assemble_kernel(x, top, bot, left, right, v, sem, *,
                     h8: int, w128: int, orh: int, orw: int,
                     hb: int, wr: int, wp: int):
    """Write the padded frame with 5 aligned HBM->HBM DMAs per channel."""
    c = pl.program_id(0)
    copies = [
        pltpu.make_async_copy(
            top.at[c], v.at[c, pl.ds(0, orh), pl.ds(0, wp)], sem.at[0]
        ),
        pltpu.make_async_copy(
            bot.at[c], v.at[c, pl.ds(orh + h8, hb), pl.ds(0, wp)], sem.at[1]
        ),
        pltpu.make_async_copy(
            left.at[c], v.at[c, pl.ds(orh, h8), pl.ds(0, orw)], sem.at[2]
        ),
        pltpu.make_async_copy(
            right.at[c],
            v.at[c, pl.ds(orh, h8), pl.ds(orw + w128, wr)],
            sem.at[3],
        ),
        pltpu.make_async_copy(
            x.at[c, pl.ds(0, h8), pl.ds(0, w128)],
            v.at[c, pl.ds(orh, h8), pl.ds(orw, w128)],
            sem.at[4],
        ),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def _assemble_padded(
    x: jnp.ndarray, rh: int, rw: int,
    orh: int, orw: int, hp: int, wp: int,
) -> jnp.ndarray:
    """Reflect-101-pad ``(bc, h, w)`` to ``(bc, hp, wp)`` at offset
    ``(orh, orw)`` via the assemble kernel.

    XLA's reflect-pad lowering (three full-size pad+add ops per axis) costs
    ~0.28 ms per 4K frame — 60% of the DMA form's runtime. Here XLA only
    builds the four thin edge strips (slice + flip + small pads, clamped
    reflect-101 semantics identical to :func:`reflect_101`); the bulk of
    the padded frame is the center block, moved by one tile-aligned
    HBM->HBM DMA at memcpy speed. Alignment slack (rows ``< orh - rh``,
    cols ``< orw - rw``) and the trailing grid padding are zero-filled
    inside the strips, preserving the previous zero-fill semantics.
    """
    bc, h, w = x.shape
    h8, w128 = (h // 8) * 8, (w // 128) * 128
    top, bot, hb = _topbot_strips(x, rh, rw, orh, orw, hp, wp)
    wr = wp - orw - w128
    left, right = _lr_borders(x, rw, orw, wr)

    return pl.pallas_call(
        functools.partial(
            _assemble_kernel, h8=h8, w128=w128, orh=orh, orw=orw,
            hb=hb, wr=wr, wp=wp,
        ),
        grid=(bc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bc, hp, wp), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((5,))],
        interpret=jax.default_backend() != "tpu",
    )(x, top, bot, left, right)


def _assemble_kernel4(x, bot, left, right, v, sem, *,
                      h8: int, w128: int, orw: int,
                      hb: int, wr: int, wp: int):
    """Rows-prepadded variant: 4 aligned HBM->HBM DMAs per channel
    (no top strip — the caller's halo rows sit at row 0)."""
    c = pl.program_id(0)
    copies = [
        pltpu.make_async_copy(
            bot.at[c], v.at[c, pl.ds(h8, hb), pl.ds(0, wp)], sem.at[0]
        ),
        pltpu.make_async_copy(
            left.at[c], v.at[c, pl.ds(0, h8), pl.ds(0, orw)], sem.at[1]
        ),
        pltpu.make_async_copy(
            right.at[c],
            v.at[c, pl.ds(0, h8), pl.ds(orw + w128, wr)],
            sem.at[2],
        ),
        pltpu.make_async_copy(
            x.at[c, pl.ds(0, h8), pl.ds(0, w128)],
            v.at[c, pl.ds(0, h8), pl.ds(orw, w128)],
            sem.at[3],
        ),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def _assemble_padded_prepad(
    x: jnp.ndarray, rw: int, orw: int, hp: int, wp: int
) -> jnp.ndarray:
    """Column-pad a rows-prepadded ``(bc, hs, w)`` shard (``hs`` already
    carries the row halos) to ``(bc, hp, wp)`` with the data at
    ``(0, orw)``: reflect-101 columns locally, zero trailing rows/cols.
    Same HBM->HBM structure as :func:`_assemble_padded`, minus the top
    strip."""
    bc, hs, w = x.shape
    h8, w128 = (hs // 8) * 8, (w // 128) * 128

    def colmap(blk):
        blk = reflect_101(blk, [(rw, rw)], axes=[-1])
        return jnp.pad(
            blk, [(0, 0), (0, 0), (orw - rw, wp - (orw - rw) - blk.shape[-1])]
        )

    # hb == 0 is possible when everything aligns (h % th == 0, sh % 8
    # == 0, hs % 8 == 0): grow v by one sublane tile so the bottom DMA
    # keeps a legal extent — the kernel never fetches past the old hp
    hp = hp if hp > h8 else hp + 8
    hb = hp - h8
    bot = colmap(x[:, h8:, :])
    bot = jnp.pad(bot, [(0, 0), (0, hb - bot.shape[1]), (0, 0)])
    wr = wp - orw - w128
    left, right = _lr_borders(x, rw, orw, wr)

    return pl.pallas_call(
        functools.partial(
            _assemble_kernel4, h8=h8, w128=w128, orw=orw,
            hb=hb, wr=wr, wp=wp,
        ),
        grid=(bc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bc, hp, wp), x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
        interpret=jax.default_backend() != "tpu",
    )(x, bot, left, right)


def dma_form_applicable(
    dtype, plan: BlurPlan, precision: str = "int8",
    out_u8: bool | None = None,
) -> bool:
    """True when the DMA form serves this (dtype, plan, precision) on TPU.

    ``out_u8`` sizes the VMEM model's double-buffered output strips;
    ``None`` means the output dtype matches the input (u8->u8, f32->f32).
    Callers producing float output from uint8 frames (the sharded path's
    ``out_u8=False`` default) must pass ``out_u8=False`` or the model
    under-counts the out strips 4x and approves geometries that blow VMEM.
    """
    if jax.default_backend() != "tpu":
        return False
    is_u8 = jnp.dtype(dtype) == jnp.uint8
    if precision in ("int8", "hybrid") and not (
        is_u8 and int8_applicable(plan, jnp.uint8)
    ):
        return False
    if precision == "bf16" and not is_u8:
        return False  # float inputs would drop ~8 mantissa bits silently
    if not is_u8 and jnp.dtype(dtype) != jnp.float32:
        return False
    rh, rw = plan.col.support_radius, plan.row.support_radius
    if rh == 0 or rw == 0:
        return False
    if max(rh, rw) > _chunk_max_radius():
        # measured DMA wins (4K batch 4, min-of-reps) through r=515:
        # +11% at r=33, +15% at r=165, +9% at r=332, +7% at r=515 — the
        # single dense band matmul per pass beats the blocked form's
        # chunked neighbor dots even where the exact window READS more
        # (compute-side win). Beyond, the blocked wide machinery (the
        # int16-E split) keeps its regime: probed at 348 MP r=1863, the
        # chunked DMA form runs 453 ms (tile (720, 256), its best
        # VMEM-feasible geometry) vs the split form's 264 ms — band-MAC
        # growth ~6r/px loses to the split's two dense passes there.
        return False
    in_b = 1 if is_u8 else 4
    out_b = in_b if out_u8 is None else (1 if out_u8 else 4)
    mat_b = 2 if precision == "int8" else 4
    h, w = plan.shape
    th, tw = _pick_tile_dma(plan, in_b, precision, out_b=out_b)
    cw, ch = _pick_chunks_dma(th, tw, rh, rw, precision)
    vmem = _dma_vmem_bytes(h, w, th, tw, rh, rw, in_b, mat_b, cw, ch, out_b)
    return vmem <= _hw().wide_vmem_budget


def _dma_vmem_bytes(
    h: int, w: int, th: int, tw: int, rh: int, rw: int,
    in_b: int, mat_b: int, cw: int, ch: int, out_b: int | None = None,
    n_slots: int | None = None, nch: int = 1,
) -> int:
    """VMEM bytes for one grid step of the DMA kernel at this geometry.

    Double-buffered aligned input windows + the (chunk-sized) band hi/lo
    stacks + the rows-pass intermediates (r/e int32 + the e1/e0 digit
    planes, all (sh, tw)-shaped) + the cols-pass digit products and f32
    tile ((th, tw) x 4 int32/f32 planes) + the out BlockSpec, which
    holds the WHOLE row strip (1, th, nbw*tw) double-buffered — at the
    OUTPUT element width ``out_b`` (1 for u8 out, 4 for f32 out; defaults
    to ``in_b``, which matches u8->u8 and f32->f32 but NOT the sharded
    path's u8-in/f32-out combination). Both per-tile terms scale with th,
    which is what bounds the whole-height tile choice.
    """
    _, _, ro, co, sh, _, shp, swp = _align_geometry(th, tw, rh, rw)
    nbw = -(-w // tw)
    if out_b is None:
        out_b = in_b
    if n_slots is None:
        # model the slots the kernel will actually allocate — per-call
        # overrides (the slot-sweep probe) must not be admitted against
        # a 2-slot model (round-3 advisor finding)
        n_slots = _N_WIN_SLOTS
    # the channel-folded form (nch > 1) scales the window slots and the
    # double-buffered out strips by the folded plane count; the compute
    # intermediates stay single-plane (planes are processed sequentially)
    return (
        n_slots * nch * shp * swp * in_b
        # the (co, ro) band terms and shp-tall intermediates below model
        # the ALIGNED-compute layout (zero-prepended bands, rows pass on
        # all shp sublanes). That mode is OFF (``_ALIGNED_COMPUTE`` —
        # measured 10-25% slower and refuted), so with the default
        # sliced layout these terms over-count by the co/ro/(shp-sh)
        # rows — kept deliberately as a safety margin so the routing
        # model stays valid for either compute layout and tile
        # admission errs toward fitting (round-4 advisor note).
        + (co + cw + 2 * rw) * cw * mat_b
        + (ro + ch + 2 * rh) * ch * mat_b
        + shp * tw * 10  # r + e (int32) + e1/e0 (int8)
        + th * tw * 16  # p1/p23/p4 (int32) + the f32 tile
        # out strips (ceil128(w) wide) are double-buffered too
        + 2 * nch * th * min(nbw * tw, -(-w // 128) * 128) * out_b
    )


def _pick_chunks_dma(
    th: int, tw: int, rh: int, rw: int, precision: str = "int8"
) -> tuple[int, int]:
    """Band-matmul chunk sizes (cw lanes, ch sublanes) for one tile.

    MACs per output pixel fall from the dense ``t + 2r`` to ``c + 2r``,
    so smaller chunks cut compute. Rows chunking is shape-safe at any
    radius (the dot keeps its tall M = sh; only N shrinks, and 128 is
    exactly one MXU tile), so ``cw = 128``. Cols chunking shrinks the
    output M dim; measured at 4K r=32 the sweep gave ch=24 as the sweet
    spot (2.97 -> 1.76-2.08 ms across tiles, vs 2.38 at ch=72 and 2.73
    at ch=8). Chunks need NOT divide the tile: the kernels handle a tail
    chunk by statically slicing the band operand (band matrices are
    translation-invariant), so any tile height — including whole-frame
    strips at awkward heights — keeps small cols chunks.

    Both precisions chunk. int8's skipped terms are exact int32 zeros,
    so the result is BIT-IDENTICAL (TPU sweeps: small-radius hand sweep
    + wide-radius r=95..515, ``dma_chunk_sweep_wide*.json`` — chunked
    wins at every measured radius, 1.2-1.7x). bf16x3 chunking regroups
    f32 partial sums (the nonzero terms land in different 128-deep MXU
    accumulation blocks), which can move rounding either way; the device
    sweep (``dma_chunk_sweep_bf16x3.json``, r=32/95/332) certified every
    chunked variant <= 1 uint8 count vs the dense form and measured
    chunked 1.5-2.5x faster (e.g. r=32 dense 3.68 -> ~1.3-1.6 ms,
    r=332 11.05 -> 7.5-9.6 ms), so bf16x3 is ungated with the same
    cw=128 policy.

    The cols chunk GROWS with the vertical radius: the interleaved
    whole-height confirm runs (2026-08-19, batch-4 4K, min-of-many,
    3 rounds each) measured best ch = 24/48/96/120 at rh =
    95/165/332/515 (e.g. r=515: ch=120 6.89 ms vs ch=24 7.90; r=332:
    ch=96 4.46 vs ch=80 4.79 vs ch=24 5.11; r=165: ch=48 2.62 vs ch=40
    2.83 vs ch=24 2.61->2.72 band) — ``ch = 24 * ceil(rh / 96)``
    clamped to [24, 120] reproduces every anchor, and r=32 keeps the
    swept ch=24.
    """
    if max(rh, rw) > _chunk_max_radius():
        return tw, th
    ch = min(120, 24 * -(-rh // 96)) if rh > 0 else 24
    return min(128, tw), min(ch, th)


def _pick_tile_dma(
    plan: BlurPlan, in_b: int = 1, precision: str = "int8",
    chunked: bool | None = None, out_b: int | None = None,
) -> tuple[int, int]:
    """Tile for the DMA form (no halo-block constraint on th).

    ``chunked=None`` infers the regime from (precision, radius);
    ``chunked=False`` forces the dense-regime tile policy — the sweep
    harness uses it to time the REAL dense baseline (incl. the row-tile
    cost search) rather than a reimplementation of the target formula.

    Dense-dot sweeps at 4K batch 4 put the row tile at ~2.6*rh capped
    432 (r=33 best (216, 384) 11.7 GP/s). With the chunked band matmuls
    (int8, see ``_pick_chunks_dma``) the per-pixel compute no longer
    grows with the tile, so the halo-traffic ratio dominates and TALLER
    tiles win — all the way to the WHOLE FRAME HEIGHT when the VMEM
    budget allows (zero vertical halo re-read, one row strip per
    channel): interleaved min-of-5 at 4K r=32 measured th=2160 at
    0.98 ms vs th=720 at 1.13 and th=1080 at 1.12. Where whole height
    does NOT fit (giant frames: the double-buffered out strip spans the
    frame width, so its VMEM term is ``2 * th * ceil128(w)``), the
    TALLEST feasible strip still beats the swept 720 partial-strip
    target — the rows pass computes ``th + 2rh`` intermediate rows per
    strip, so the redundancy ratio falls from 2.38 to ~1.43 at
    24000x14500 r=514: measured 77.0 -> 60.0 ms (744- vs 2232-tall,
    bit-identical). The chunked regime therefore tries ``ceil8(h)``
    first, then the largest VMEM-feasible strip (waste-aware: ties
    within 5% of the traffic x waste cost prefer heights dividing H
    exactly, then the cheapest, then the tallest — 24000 picks 2400,
    an exact 10-strip split; 24-divisibility is NOT a criterion since
    tail chunks keep ch=24 at any height), then the swept 720 target,
    then the dense target — taking the
    first whose VMEM estimate fits. The partial-strip row tile is
    then refined by a local cost search (halo-traffic ratio x grid-padding
    waste) in a +-56 band around that target: an early exact-divisor-of-H
    preference picked pathologically short tiles at awkward heights
    (H=23000 -> th=200, a 6x instead of 3.3x input-traffic ratio at r~500
    — the 1.2-1.4x giant-frame sweep regressions). Ties within 5% prefer
    tiles dividing H exactly, then proximity to the target. The lane tile
    prefers 384 until the window contraction is already long (rw >= 300),
    where 256 wins. Taller tiles grow the out-strip VMEM term
    (``th * nbw * tw * in_b``) — on very wide or float frames where the
    720 target would blow the budget the old dense-regime target had
    cleared, the picker falls back to that shorter target so the DMA
    form keeps its pre-chunk envelope."""
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    if chunked is None:
        chunked = max(rh, rw) <= _chunk_max_radius()
    dense_target = min(max(216, int(2.6 * rh)), 432)
    if chunked:
        # chunked-dot regime: compute no longer grows with the tile, so
        # the halo-traffic ratio dominates — whole-height first (zero
        # vertical halo re-read), then the tallest VMEM-feasible strip
        # (giant frames), then the swept partial-strip targets
        targets = ["full", "vmax", min(720, -(-h // 8) * 8), dense_target]
    else:
        # dense-dot regime (unchanged until the wide-radius chunk sweep)
        targets = [dense_target]

    def rows_tile(target: int) -> int:
        if h <= 224:
            return max(8, -(-h // 8) * 8)

        def cost(t: int) -> float:
            traffic = (t + 2 * rh) / t
            waste = (-(-h // t) * t) / h
            return traffic * waste

        lo = -(-max(160, target - 56) // 8) * 8  # sublane-aligned tiles
        cands = list(range(lo, target + 57, 8))
        cmin = min(cost(t) for t in cands)
        near = [t for t in cands if cost(t) <= cmin * 1.05]
        # prefer H-divisible, then (chunked regime only) 24-divisible —
        # letting the cols band matmul run in small chunks — then
        # closest to target
        return min(
            near,
            key=lambda t: (
                h % t != 0, chunked and t % 24 != 0, abs(t - target), t
            ),
        )

    mat_b = 2 if precision == "int8" else 4
    if out_b is None:
        out_b = in_b

    def vmem_fits(t: int, lanes: int) -> bool:
        cwc, chc = _pick_chunks_dma(t, lanes, rh, rw, precision)
        return _dma_vmem_bytes(
            h, w, t, lanes, rh, rw, in_b, mat_b, cwc, chc, out_b
        ) <= _hw().wide_vmem_budget

    def vmax_tile(lanes: int) -> int | None:
        """Tallest-strip-count VMEM-feasible tile, waste-optimal.

        The VMEM estimate is monotone in th, so binary-search the
        feasible ceiling ``thmax``. The traffic x waste cost
        ``(t + 2rh)/t * ceil(h/t)*t/h`` simplifies to
        ``n*(t + 2rh)/h`` within a fixed strip count ``n = ceil(h/t)``
        — increasing in t — so each class's optimum is its SHORTEST
        covering tile ``ceil8(h/n)``, and those are the only candidates
        worth considering (the raw thmax is dominated by its own
        class's optimum). Cost across classes grows with n (more halo
        re-reads), so the minimal feasible strip count essentially
        wins; ties within 5% prefer heights dividing H exactly, then
        cheaper, then taller (NOT 24-divisibility — tail chunks keep
        ch=24 at any height)."""
        hi = -(-h // 8) * 8
        if not vmem_fits(160, lanes):
            return None
        lo = 160
        while lo < hi:  # largest multiple of 8 in [160, hi] that fits
            mid = -(-((lo + hi + 8) // 2) // 8) * 8
            if vmem_fits(mid, lanes):
                lo = mid
            else:
                hi = mid - 8
        if lo <= 224:
            return lo

        def cost(t: int) -> float:
            return (t + 2 * rh) / t * ((-(-h // t) * t) / h)

        n0 = -(-h // lo)  # minimal feasible strip count
        cands = []
        for n in range(n0, n0 + 4):
            t_exact = -(-h // n)  # ceil(h / n)
            t = max(160, -(-t_exact // 8) * 8)  # ceil8
            if t <= lo and t not in cands:
                cands.append(t)
        cmin = min(cost(t) for t in cands)
        near = [t for t in cands if cost(t) <= cmin * 1.05]
        return min(near, key=lambda t: (h % t != 0, cost(t), -t))

    # chunked regime: tw=384 wins at EVERY confirmed radius incl. wide
    # (r=515: (384, ch=120) 6.89 ms vs best-of-256 7.86 — the old
    # rw >= 300 -> 256 rule came from the dense-regime sweeps and only
    # applies there)
    tw = 384 if (chunked or rw < 300) else 256
    if w < tw:
        tw = max(128, -(-w // 128) * 128)
    choice = None
    for target in targets:
        if target == "full":
            th = -(-h // 8) * 8
        elif target == "vmax":
            th = vmax_tile(tw)
            if th is None:
                continue
        else:
            th = rows_tile(target)
        choice = (th, tw)
        cw, ch = _pick_chunks_dma(th, tw, rh, rw, precision)
        fits = _dma_vmem_bytes(
            h, w, th, tw, rh, rw, in_b, mat_b, cw, ch, out_b
        ) <= _hw().wide_vmem_budget
        if fits:
            return choice
    return choice  # over budget at every target: applicability rejects


def _band_operands(
    plan: BlurPlan, precision: str, cw: int, ch: int,
    co: int = 0, ro: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Quantized/pre-split band-matrix operands -> (bw, bh, rows_shift,
    cols_scale).

    ``(co, ro)`` prepend that many ZERO rows to the row/column bands —
    the aligned-compute mode's offset fold (``_ALIGNED_COMPUTE``): zero
    taps contribute exact zeros, so contracting the padded band against
    the lane/sublane-ALIGNED window slice reproduces the offset window's
    sums bit-identically."""
    bw_np = band_block_matrix(plan.row.taps, cw)  # (cw + 2rw, cw)
    bh_np = band_block_matrix(plan.col.taps, ch)  # (ch + 2rh, ch)
    if co:
        bw_np = np.vstack([np.zeros((co, bw_np.shape[1]), bw_np.dtype),
                           bw_np])
    if ro:
        bh_np = np.vstack([np.zeros((ro, bh_np.shape[1]), bh_np.dtype),
                           bh_np])
    rows_shift = 7
    cols_scale = 1
    if precision in ("int8", "hybrid", "ablate_rows"):
        rows_scale = pick_int8_scale(plan.row.taps, pow2=True)
        cols_scale = pick_int8_scale(plan.col.taps)
        rows_shift = 7 + (rows_scale // (127 * 128)).bit_length() - 1

        def as_i8(q: np.ndarray) -> jnp.ndarray:
            return jnp.asarray(np.stack([q >> 7, q & 127]).astype(np.int8))

        bw = as_i8(_quantize_band_int8(bw_np, rows_scale))
        if precision == "hybrid":
            # cols ride the bf16 band (hi/lo stacked; hybrid reads hi)
            bhj = jnp.asarray(bh_np)
            hi = bhj.astype(jnp.bfloat16)
            lo = (bhj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = jnp.stack([hi, lo])
            cols_scale = 1
        else:
            bh = as_i8(_quantize_band_int8(bh_np, cols_scale))
    else:  # bf16x3: pre-split hi/lo stacks, computed once at trace time
        def as_bf16(m: np.ndarray) -> jnp.ndarray:
            mj = jnp.asarray(m)
            hi = mj.astype(jnp.bfloat16)
            lo = (mj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.stack([hi, lo])

        bw = as_bf16(bw_np)
        bh = as_bf16(bh_np)
    return bw, bh, rows_shift, cols_scale


def _check_slots_vmem(
    plan: BlurPlan, precision: str, th: int, tw: int, cw: int, ch: int,
    n_slots: int, in_b: int, out_u8: bool,
) -> None:
    """Launch-time guard: a per-call ``n_slots`` override (the slot-sweep
    probe) re-validates the VMEM model at the slot count the kernel will
    ACTUALLY allocate — the routing gate only modeled ``_N_WIN_SLOTS``
    (round-3 advisor finding)."""
    if n_slots == _N_WIN_SLOTS:
        return  # the geometry was admitted against exactly this model
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    mat_b = 2 if precision == "int8" else 4
    vmem = _dma_vmem_bytes(
        h, w, th, tw, rh, rw, in_b, mat_b, cw, ch,
        1 if out_u8 else 4, n_slots=n_slots,
    )
    limit = _hw().kernel_vmem_limit
    if vmem > limit:
        raise ValueError(
            f"n_slots={n_slots} needs ~{vmem >> 20} MiB VMEM at tile "
            f"({th}, {tw}) — over the {limit >> 20} MiB kernel limit; "
            "shrink the tile or the slot count"
        )


def _dma_kernel_call(
    x: jnp.ndarray,
    plan: BlurPlan,
    precision: str,
    out_u8: bool,
    th: int,
    tw: int,
    cw: int,
    ch: int,
    rows_prepadded: bool = False,
    n_slots: int | None = None,
    pipelined: bool = False,
) -> jnp.ndarray:
    """The pallas_call stage on an already-assembled padded ``(bc, hp, wp)``
    frame -> uncropped ``(bc, nbh*th, nbw*tw)``. Split out so the
    decomposition benchmark can time the kernel without the pad stage.
    ``pipelined`` selects the experimental software-pipelined int8 form
    (``_kernel_pipe``)."""
    if n_slots is None:
        n_slots = _N_WIN_SLOTS
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    _check_slots_vmem(plan, precision, th, tw, cw, ch, n_slots,
                      1 if x.dtype == jnp.uint8 else 4, out_u8)
    _, _, ro, co, sh, sw, shp, swp = _align_geometry(
        th, tw, rh, rw, rows_prepadded
    )
    bc = x.shape[0]
    nbh, nbw = -(-h // th), -(-w // tw)
    # out strips span ceil128(w), not nbw*tw — the last window writes a
    # partial tl-lane slice, making the caller's [:w] crop a no-op for
    # 128-divisible widths instead of a full-frame copy
    wout = min(nbw * tw, -(-w // 128) * 128)
    tl = wout - (nbw - 1) * tw

    use_pipe = pipelined and precision == "int8" and nbw >= 2
    aligned = _ALIGNED_COMPUTE and x.dtype == jnp.uint8 and not use_pipe
    bw, bh, rows_shift, cols_scale = _band_operands(
        plan, precision, cw, ch,
        co if aligned else 0, ro if aligned else 0,
    )

    mat = lambda shape: pl.BlockSpec(
        shape, (lambda c, i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    if use_pipe:
        body = functools.partial(
            _kernel_pipe, sh=sh, shp=shp, sw=sw, swp=swp, th=th, tw=tw,
            nbw=nbw, cw=cw, ch=ch, rows_shift=rows_shift,
            cols_scale=cols_scale, out_u8=out_u8, ro=ro, co=co, tl=tl,
            n_slots=n_slots,
        )
        scratch = [
            pltpu.VMEM((n_slots, shp, swp), x.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.VMEM((2, sh, tw), jnp.int32),  # staged rows outputs
        ]
    else:
        body = functools.partial(
            _kernel, sh=sh, shp=shp, sw=sw, swp=swp, th=th, tw=tw, nbw=nbw,
            cw=cw, ch=ch,
            precision=precision, rows_shift=rows_shift,
            cols_scale=cols_scale, out_u8=out_u8, ro=ro, co=co, tl=tl,
            n_slots=n_slots, aligned=aligned,
        )
        scratch = [
            pltpu.VMEM((n_slots, shp, swp), x.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ]
    out = pl.pallas_call(
        body,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_hw().kernel_vmem_limit
        ),
        grid=(bc, nbh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            mat(bw.shape),
            mat(bh.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wout), lambda c, i: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bc, nbh * th, wout), jnp.uint8 if out_u8 else jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=jax.default_backend() != "tpu",
    )(x, bw, bh)
    return out


def _dma_kernel_call_direct(
    x: jnp.ndarray,
    plan: BlurPlan,
    precision: str,
    out_u8: bool,
    th: int,
    tw: int,
    cw: int,
    ch: int,
    n_slots: int | None = None,
    nch: int = 1,
) -> jnp.ndarray:
    """No-assemble pallas_call on the ORIGINAL ``(bc, h, w)`` frame ->
    uncropped ``(bc, nbh*th, wout)``. The in-VMEM window splice
    (``_kernel_direct``) replaces the padded-frame assemble stage — the
    only XLA-built inputs are the four thin edge strips. ``nch > 1``
    folds that many contiguous channel planes into each DMA descriptor
    (grid walks frames; see ``_kernel_direct``); requires
    ``bc % nch == 0``."""
    if n_slots is None:
        n_slots = _N_WIN_SLOTS
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    _check_slots_vmem(plan, precision, th, tw, cw, ch, n_slots,
                      1 if x.dtype == jnp.uint8 else 4, out_u8)
    orh, orw, ro, co, sh, sw, shp, swp = _align_geometry(th, tw, rh, rw)
    bc = x.shape[0]
    nbh, nbw = -(-h // th), -(-w // tw)
    h8, w128 = (h // 8) * 8, (w // 128) * 128
    wout = min(nbw * tw, -(-w // 128) * 128)
    tl = wout - (nbw - 1) * tw
    hp = (nbh - 1) * th + shp
    wp = (nbw - 1) * tw + swp
    wr = wp - orw - w128

    top, bot, hb = _topbot_strips(x, rh, rw, orh, orw, hp, wp)
    lb, rb = _lr_borders(x, rw, orw, wr)
    aligned = _ALIGNED_COMPUTE and x.dtype == jnp.uint8
    bw, bh, rows_shift, cols_scale = _band_operands(
        plan, precision, cw, ch,
        co if aligned else 0, ro if aligned else 0,
    )

    if nch > 1 and bc % nch:
        raise ValueError(f"nch={nch} requires bc % nch == 0, got bc={bc}")
    mat = lambda shape: pl.BlockSpec(
        shape, (lambda c, i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    win_shape = (
        (n_slots, nch, shp, swp) if nch > 1 else (n_slots, shp, swp)
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_direct, sh=sh, shp=shp, sw=sw, swp=swp, th=th, tw=tw,
            nbh=nbh, nbw=nbw, cw=cw, ch=ch, precision=precision,
            rows_shift=rows_shift, cols_scale=cols_scale, out_u8=out_u8,
            ro=ro, co=co, tl=tl, orh=orh, orw=orw, h8=h8, w128=w128,
            n_slots=n_slots, aligned=aligned, nch=nch,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_hw().kernel_vmem_limit
        ),
        grid=(bc // nch, nbh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5 + [
            mat(bw.shape),
            mat(bh.shape),
        ],
        out_specs=pl.BlockSpec(
            (nch, th, wout), lambda c, i: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bc, nbh * th, wout), jnp.uint8 if out_u8 else jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM(win_shape, x.dtype),
            pltpu.SemaphoreType.DMA((n_slots, 4)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, top, bot, lb, rb, bw, bh)
    return out


def _dma_kernel_call_strip(
    x: jnp.ndarray,
    plan: BlurPlan,
    precision: str,
    out_u8: bool,
    th: int,
    tw: int,
    cw: int,
    ch: int,
) -> jnp.ndarray:
    """Whole-strip pallas_call on the ORIGINAL ``(bc, h, w)`` frame ->
    uncropped ``(bc, nbh*th, wout)``: each padded row strip spliced into
    VMEM once (<= 5 DMAs), prefetched across grid steps — see
    ``_kernel_strip``."""
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    orh, orw, ro, co, sh, sw, shp, swp = _align_geometry(th, tw, rh, rw)
    bc = x.shape[0]
    nbh, nbw = -(-h // th), -(-w // tw)
    h8, w128 = (h // 8) * 8, (w // 128) * 128
    wout = min(nbw * tw, -(-w // 128) * 128)
    tl = wout - (nbw - 1) * tw
    hp = (nbh - 1) * th + shp
    wp = (nbw - 1) * tw + swp
    wr = wp - orw - w128

    top, bot, hb = _topbot_strips(x, rh, rw, orh, orw, hp, wp)
    lb, rb = _lr_borders(x, rw, orw, wr)
    bw, bh, rows_shift, cols_scale = _band_operands(plan, precision, cw, ch)

    mat = lambda shape: pl.BlockSpec(
        shape, (lambda c, i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_strip, sh=sh, shp=shp, sw=sw, swp=swp, th=th, tw=tw,
            nbh=nbh, nbw=nbw, cw=cw, ch=ch, precision=precision,
            rows_shift=rows_shift, cols_scale=cols_scale, out_u8=out_u8,
            ro=ro, co=co, tl=tl, orh=orh, orw=orw, h8=h8, w128=w128,
            wp=wp, bc=bc,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_hw().kernel_vmem_limit
        ),
        grid=(bc, nbh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5 + [
            mat(bw.shape),
            mat(bh.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wout), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bc, nbh * th, wout), jnp.uint8 if out_u8 else jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, shp, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, top, bot, lb, rb, bw, bh)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "precision", "out_u8", "tile", "chunks", "rows_prepadded",
        "direct", "pipelined", "strip", "nch", "resident",
    ),
)
def _blur_fused_dma_impl(
    planar: jnp.ndarray,
    plan: BlurPlan,
    precision: str,
    out_u8: bool,
    tile: tuple[int, int] | None = None,
    chunks: tuple[int, int] | None = None,
    rows_prepadded: bool = False,
    direct: bool | None = None,
    pipelined: bool = False,
    strip: bool | None = None,
    nch: int | None = None,
    resident: bool | None = None,
) -> jnp.ndarray:
    h, w = plan.shape
    rh, rw = plan.col.support_radius, plan.row.support_radius
    in_b = 1 if planar.dtype == jnp.uint8 else 4
    out_b = 1 if out_u8 else 4

    lead = planar.shape[:-2]
    if resident:
        # rows-resident full-width form (its own tile policy: short
        # full-width strips; `tile` may pin (th, *) for sweeps)
        thr = tile[0] if tile else _pick_tile_resident(
            plan, precision, out_b
        )
        cwr, chr_ = chunks or _pick_chunks_dma(
            thr or 256, 128, rh, rw, precision
        )
        if thr is None or not _resident_applicable(
            h, w, thr, rh, rw, in_b, out_b, precision, rows_prepadded,
            cwr, min(chr_, thr or 8),
        ):
            raise ValueError(
                "resident=True: the rows-resident kernel does not serve "
                f"this geometry (shape {plan.shape}, precision "
                f"{precision})"
            )
        x = planar.reshape((-1,) + planar.shape[-2:])
        out = _dma_kernel_call_resident(
            x, plan, precision, out_u8, thr, cwr, min(chr_, thr)
        )
        return out[:, :h, :w].reshape(lead + (h, w))

    th, tw = tile or _pick_tile_dma(plan, in_b, precision, out_b=out_b)
    cw, ch = chunks or _pick_chunks_dma(th, tw, rh, rw, precision)
    orh, orw, ro, co, sh, sw, shp, swp = _align_geometry(
        th, tw, rh, rw, rows_prepadded
    )

    x = planar.reshape((-1,) + planar.shape[-2:])
    if x.dtype != jnp.uint8:
        x = x.astype(jnp.float32)
    nbh, nbw = -(-h // th), -(-w // tw)

    if strip is None:
        # Round-5 batch-gated routing (verdict item 3): two independent
        # sessions measured the whole-strip form faster at the headline
        # regime and slower outside it — round 4 (dma_strip_ab.json)
        # batch-4 sigma=10: 0.947 -> 0.932 ms hybrid / 1.30 -> 1.29
        # int8, single-frame sigma=48/90/120 SLOWER; round 5
        # (dma_strip_batch_gate.json) planes 9/12 at sigma=10: 0.751 ->
        # 0.731 / 1.025 -> 0.955, planes <= 6 and every sigma=48 batch
        # point neutral-or-slower. So the route is the measured win
        # region ONLY: >= 9 planes AND max radius <= 32 (the sigma=10
        # anchor; r 33..158 is unmeasured and stays windowed). The form
        # is bit-identical (test_band_fused strip-vs-direct test), so
        # this is purely a perf crossover.
        strip = (
            _STRIP_MIN_PLANES is not None
            and x.shape[0] >= _STRIP_MIN_PLANES
            and max(rh, rw) <= _STRIP_MAX_RADIUS
            and not rows_prepadded
            and jax.default_backend() == "tpu"
            and _strip_applicable(
                h, w, th, tw, rh, rw, in_b, out_b, precision,
                rows_prepadded,
            )
        )
    elif strip:
        if not _strip_applicable(
            h, w, th, tw, rh, rw, in_b, out_b, precision, rows_prepadded
        ):
            raise ValueError(
                "strip=True: the whole-strip kernel does not serve this "
                f"geometry (shape {plan.shape}, tile {(th, tw)})"
            )
    if strip:
        out = _dma_kernel_call_strip(
            x, plan, precision, out_u8, th, tw, cw, ch
        )
        return out[:, :h, :w].reshape(lead + (h, w))

    if direct is None:
        direct = (
            not pipelined  # the pipelined probe targets the assemble form
            and _direct_applicable(h, w, th, tw, rh, rw, rows_prepadded)
        )
    if nch is None:
        # channel folding auto-routes for SINGLE RGB frames only: the
        # interleaved A/B (dma_ch3_ab.json + dma_ch3_ab2.json) measured
        # 1.21x at single-4K sigma=10 (0.171 -> 0.141 ms) and ~neutral at
        # sigma=48, but 3-20% SLOWER at batch >= 2 (the longer grid
        # already hides per-window DMA latency and the 3x out strips
        # cost); gated on the VMEM model at the folded footprint
        nch = 1
        if direct and x.shape[0] == 3 and jax.default_backend() == "tpu":
            in_b_ = 1 if x.dtype == jnp.uint8 else 4
            mat_b = 2 if precision == "int8" else 4
            if _dma_vmem_bytes(
                h, w, th, tw, rh, rw, in_b_, mat_b, cw, ch,
                1 if out_u8 else 4, nch=3,
            ) <= _hw().kernel_vmem_limit:
                nch = 3
    if direct:
        out = _dma_kernel_call_direct(
            x, plan, precision, out_u8, th, tw, cw, ch, nch=nch
        )
        return out[:, :h, :w].reshape(lead + (h, w))

    # pad so every (shp, swp) fetch starting at (i*th, j*tw) is in bounds
    # and the original sits at the aligned offset (orh, orw) — or at
    # (0, orw) when the caller supplied the row halos (multi-chip shards)
    hp = (nbh - 1) * th + shp
    wp = (nbw - 1) * tw + swp
    if rows_prepadded:
        if x.shape[-2] != h + 2 * rh:
            raise ValueError(
                f"rows_prepadded input must have {h + 2 * rh} rows, "
                f"got {x.shape[-2]}"
            )
        if x.shape[-2] >= 8 and w >= 128:
            x = _assemble_padded_prepad(x, rw, orw, hp, wp)
        else:
            x = reflect_101(x, [(rw, rw)], axes=[-1])
            x = jnp.pad(
                x,
                [
                    (0, 0),
                    (0, hp - x.shape[-2]),
                    (co, wp - co - x.shape[-1]),
                ],
            )
    elif h >= 8 and w >= 128:
        x = _assemble_padded(x, rh, rw, orh, orw, hp, wp)
    else:
        # degenerate DMA extents: keep the XLA reflect-pad route
        x = reflect_101(x, [(rh, rh), (rw, rw)], axes=[-2, -1])
        x = jnp.pad(
            x,
            [
                (0, 0),
                (ro, hp - ro - x.shape[-2]),
                (co, wp - co - x.shape[-1]),
            ],
        )

    out = _dma_kernel_call(
        x, plan, precision, out_u8, th, tw, cw, ch, rows_prepadded,
        pipelined=pipelined,
    )
    return out[:, :h, :w].reshape(lead + (h, w))


def blur_fused_u8_dma(
    planar_u8: jnp.ndarray,
    plan: BlurPlan,
    tile: tuple[int, int] | None = None,
    precision: str = "int8",
) -> jnp.ndarray:
    """uint8 planar ``(..., H, W)`` -> uint8, exact-window DMA fused blur.

    Same math and <=1-count class as ``fused_blur.blur_fused_u8``; callers
    must check :func:`dma_form_applicable` first. ``precision="bf16x3"``
    serves signed/asymmetric custom taps (int8 needs non-negative
    unit-sum taps).
    """
    if precision.startswith("ablate"):
        raise ValueError(
            "ablate_* precisions are decomposition probes (their output "
            "is not a blur); call _blur_fused_dma_impl directly"
        )
    return _blur_fused_dma_impl(planar_u8, plan, precision, True, tile)


def blur_fused_haloed_dma(
    planar: jnp.ndarray,
    plan: BlurPlan,
    precision: str = "int8",
    out_u8: bool = False,
    tile: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """DMA fused blur on ``(..., H + 2rh, W)`` whose row halos were
    supplied by the caller (another device's shard rows via ``ppermute``)
    -> ``(..., H, W)``. Columns reflect locally. The DMA-form counterpart
    of ``fused_blur.blur_fused_haloed`` — the multi-chip per-shard step
    when :func:`dma_form_applicable` holds."""
    return _blur_fused_dma_impl(
        planar, plan, precision, out_u8, tile, rows_prepadded=True
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def blur_fused_dma(planar, plan: BlurPlan, tile=None):
    """Float planar ``(..., H, W)`` -> float32, exact-window DMA fused blur
    (bf16x3). Differentiable via the shared explicit blur adjoint."""
    return _blur_fused_dma_impl(planar, plan, "bf16x3", False, tile)


def _dma_fwd(planar, plan, tile):
    return blur_fused_dma(planar, plan, tile), None


def _dma_bwd(plan, _tile, _res, ct):
    from blur_algorithms_tpu.ops.adjoint import blur_adjoint

    return (blur_adjoint(ct, plan),)


blur_fused_dma.defvjp(_dma_fwd, _dma_bwd)
