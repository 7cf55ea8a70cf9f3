"""Fused four-step FFT convolution on the MXU — one Pallas kernel per axis.

``ops/fft_mxu.py`` expresses the Bailey four-step DFT as XLA einsums; that
form is HBM-bound (~36 matmul intermediates round-trip to HBM per axis,
measured ~20-60 ms at 4K). This kernel runs the ENTIRE pipeline per block of
rows inside VMEM:

    load (Rb, n1, n2) re/im ─► stage1 (contract n1) ─► twiddle ─►
    stage2 (contract n2) ─► x H (real, permuted bins) ─► conj stage2 ─►
    conj twiddle ─► conj stage1 ─► /N ─► store

so HBM traffic is one read + one write of the padded rows, and every DFT
stage is a dense 2-D matmul on the systolic array. Complex matmuls use the
Gauss 3-multiplication identity; ``bf16x3`` hi/lo splits give f32-class
accuracy (validated <= 1 uint8 count end to end). Contractions always run
on the lane axis: the data cube is ``swapaxes``-rotated in VMEM between
stages (the four-step's classic transpose, here a register/VMEM shuffle
instead of the reference's ``flip_block`` cache transpose or an HBM pass).

Two real rows ride each complex transform (purely real kernel spectrum —
see ``ops/fft_mxu.py``); the re/im planes are the two halves of the padded
row batch, addressed by two BlockSpecs over the same array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blur_algorithms_tpu.ops.fft_mxu import (
    _factor,
    _perm_spectrum_c,
    _stage_consts,
)

__all__ = ["blur_fft_mxu_pallas", "fft_conv_rows"]


def _stack_bf16(m: np.ndarray) -> jnp.ndarray:
    mj = jnp.asarray(m)
    hi = mj.astype(jnp.bfloat16)
    lo = (mj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, lo])


def _c2r_mat(re: np.ndarray, im: np.ndarray, conj: bool = False,
             scale: float = 1.0) -> np.ndarray:
    """Complex (K, N) matrix as the real (2K, 2N) form acting on [re | im].

    ``[xre xim] @ [[re, im], [-im, re]] = [xre@re - xim@im, xre@im + xim@re]``
    — one real matmul replaces Gauss's three, and the doubled contraction
    keeps the MXU on full 128-wide tiles even for the small DFT factor
    (measured 4.5x the 9-dot Gauss form at K = 64).
    """
    im = (-im if conj else im) * scale
    re = re * scale
    return np.block([[re, im], [-im, re]]).astype(np.float64)


def _pipeline(xre, xim, f1f, f2f, f2i, f1i,
              tw_re, tw_im, twt_re, twt_im, h_refs,
              n1: int, n2: int, rb: int, complex_h: bool):
    """The full per-block transform pipeline on pre-rotated data.

    Takes ``(rb*n2, n1)`` f32 re/im planes (stage-1 contraction already in
    lanes), returns the convolved planes in the same pre-rotated
    ``(rb, n2, n1)`` layout. Shared by the pre-rotated-HBM kernel
    (``_kernel``) and the in-kernel-framing kernel (``_kernel_framed``).
    """
    f32 = jnp.float32

    def dot3(x, mref):
        """bf16x3 real matmul: x (M, 2K) f32 @ stacked hi/lo (2, 2K, 2N)."""
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        return d(xh, mref[0]) + d(xh, mref[1]) + d(xl, mref[0])

    def cdot(xre, xim, mref, k):
        """Fused-complex stage: concat halves, one doubled dot3, split."""
        y = dot3(jnp.concatenate([xre, xim], axis=-1), mref)
        return y[:, :k], y[:, k:]

    def rot(re, im, a_len, b_len):
        """(rb, a, b) -> (rb*b, a): move the contraction axis into lanes."""
        re = jnp.swapaxes(re.reshape(rb, a_len, b_len), 1, 2)
        im = jnp.swapaxes(im.reshape(rb, a_len, b_len), 1, 2)
        return re.reshape(rb * b_len, a_len), im.reshape(rb * b_len, a_len)

    def ctw(re, im, wre, wim, a_len, b_len):
        """Pointwise complex twiddle of (rb*a, b) by (a, b), f32 on the VPU."""
        re3 = re.reshape(rb, a_len, b_len)
        im3 = im.reshape(rb, a_len, b_len)
        wre, wim = wre[...][None], wim[...][None]
        return (
            (re3 * wre - im3 * wim).reshape(rb * a_len, b_len),
            (re3 * wim + im3 * wre).reshape(rb * a_len, b_len),
        )

    are, aim = cdot(xre, xim, f1f, n1)
    are, aim = ctw(are, aim, twt_re, twt_im, n2, n1)       # twiddle^T layout

    are, aim = rot(are, aim, n2, n1)                        # (rb*n1, n2)
    bre, bim = cdot(are, aim, f2f, n2)

    if complex_h:
        # asymmetric taps: full complex multiply in the permuted bins (the
        # kernel is still real in SPACE, so the packed-rows trick holds)
        hre = h_refs[0][...][None]  # (1, n1, n2)
        him = h_refs[1][...][None]
        bre3 = bre.reshape(rb, n1, n2)
        bim3 = bim.reshape(rb, n1, n2)
        b = jnp.concatenate(
            [bre3 * hre - bim3 * him, bre3 * him + bim3 * hre], axis=-1
        ).reshape(rb * n1, 2 * n2)
    else:
        # spectral multiply: real kernel spectrum in permuted (k1, k2) bins
        h = h_refs[0][...][None]  # (1, n1, 2*n2): spectrum tiled [re | im]
        b = jnp.concatenate([bre, bim], axis=-1).reshape(rb, n1, 2 * n2) * h
        b = b.reshape(rb * n1, 2 * n2)

    c = dot3(b, f2i)  # undo stage 2
    cre, cim = c[:, :n2], c[:, n2:]
    cre, cim = ctw(cre, cim, tw_re, -tw_im[...], n1, n2)   # conj twiddle

    cre, cim = rot(cre, cim, n1, n2)                        # (rb*n2, n1)
    yre, yim = cdot(cre, cim, f1i, n1)  # undo stage 1 (1/N folded into f1i)
    return yre.reshape(rb, n2, n1), yim.reshape(rb, n2, n1)


def _kernel(xre_ref, xim_ref,
            f1f, f2f, f2i, f1i,
            tw_re, tw_im, twt_re, twt_im, *h_and_out,
            n1: int, n2: int, rb: int, complex_h: bool = False):
    ore_ref, oim_ref = h_and_out[-2:]
    h_refs = h_and_out[:-2]
    # blocks arrive pre-rotated (rb, n2, n1) from an XLA-side transpose, so
    # stage 1 contracts n1 in lanes after a free sublane-merge reshape
    xre = xre_ref[...].reshape(rb * n2, n1)
    xim = xim_ref[...].reshape(rb * n2, n1)
    yre, yim = _pipeline(
        xre, xim, f1f, f2f, f2i, f1i, tw_re, tw_im, twt_re, twt_im,
        h_refs, n1, n2, rb, complex_h,
    )
    # store in the pre-rotated (rb, n2, n1) layout — the XLA side undoes it
    ore_ref[...] = yre
    oim_ref[...] = yim


def _kernel_framed(*refs,
                   n1: int, n2: int, rb: int, dim: int, pad: int,
                   complex_h: bool = False):
    """In-kernel framing variant (round-5 wide-radius lever, verdict item 1).

    Reads UNPADDED ``(rb, dim)`` row blocks straight from the frame and
    performs the per-axis framing in VMEM: reflect-101 pad (clamped
    ``pad <= dim - 1`` by plan construction, ``ops/plan.py:116``; the
    reversed edge strips arrive pre-flipped as thin ``(rb, pad)`` inputs
    because Mosaic has no lane-reverse primitive), zero extension to the
    transform length, the four-step rotation, the transform pipeline, the
    un-rotation, and the interior crop on store. HBM traffic per axis
    falls from three round trips of ``R x n`` f32 (pad+pre-rotate copy,
    kernel in/out, un-rotate+crop copy) to one round trip of ``R x dim``
    plus the thin edge strips — the regime is HBM-bound (PERF.md
    "fft_mxu"), so the saved copies buy wall time even though VMEM
    rotations were measured slightly more expensive than riding an XLA
    copy when copies must happen anyway (the round-2 rejection note; here
    they no longer happen at all). Reference anchor: the framing of
    ``Source.cpp:297-306`` (reflect pad + trailing zeros) fused into the
    transform kernel.
    """
    n = n1 * n2
    if pad:
        xre_ref, xim_ref, ere_ref, eim_ref = refs[:4]
        rest = refs[4:]
    else:
        xre_ref, xim_ref = refs[:2]
        ere_ref = eim_ref = None
        rest = refs[2:]
    # trailing scratch refs: (rb, n) row buffers + (rb, n1, n2) cubes
    row_re, row_im, cube_re, cube_im = rest[-4:]
    rest = rest[:-4]
    ore_ref, oim_ref = rest[-2:]
    f1f, f2f, f2i, f1i, tw_re, tw_im, twt_re, twt_im = rest[:8]
    h_refs = rest[8:-2]  # 1 (real spectrum) or 2 (complex) refs

    def frame(ref, eref, row_s, cube_s):
        # 1) assemble the padded row in a (rb, n) scratch: reflect edges
        # (pre-flipped XLA-side — Mosaic has no lane reverse), interior,
        # trailing zeros
        if pad:
            e = eref[...]  # (rb, 2*pad): [reversed-left | reversed-right]
            row_s[:, :pad] = e[:, :pad]
            row_s[:, pad:pad + dim] = ref[...]
            row_s[:, pad + dim:2 * pad + dim] = e[:, pad:2 * pad]
        else:
            row_s[:, :dim] = ref[...]
        tail = n - dim - 2 * pad
        if tail:
            row_s[:, 2 * pad + dim:] = jnp.zeros((rb, tail), jnp.float32)
        # 2) lane->sublane unfold (rb, n) -> (rb, n1, n2). Mosaic supports
        # neither the lane-split shape cast nor a lane-offset-mixed
        # concat, and a statically unrolled chunk-store form compiled in
        # ~8 min — a fori_loop of ref-to-ref chunk copies keeps the IR
        # small (compile ~40 s) and runs at VMEM bandwidth.
        def body(k, _):
            cube_s[:, k, :] = row_s[:, pl.ds(k * n2, n2)]
            return 0

        jax.lax.fori_loop(0, n1, body, 0)
        # 3) the same swapaxes relayout the pipeline uses between stages
        return jnp.swapaxes(cube_s[...], 1, 2).reshape(rb * n2, n1)

    yre, yim = _pipeline(
        frame(xre_ref, ere_ref, row_re, cube_re),
        frame(xim_ref, eim_ref, row_im, cube_im),
        f1f, f2f, f2i, f1i, tw_re, tw_im, twt_re, twt_im,
        h_refs, n1, n2, rb, complex_h,
    )

    def unframe(y, row_s, cube_s, out_ref):
        # (rb, n2, n1) -> natural cube -> fold back to (rb, n) rows ->
        # crop the interior [pad, pad + dim) on store
        cube_s[...] = jnp.swapaxes(y, 1, 2)

        def body(k, _):
            row_s[:, pl.ds(k * n2, n2)] = cube_s[:, k, :]
            return 0

        jax.lax.fori_loop(0, n1, body, 0)
        out_ref[...] = row_s[:, pad:pad + dim]

    unframe(yre, row_re, cube_re, ore_ref)
    unframe(yim, row_im, cube_im, oim_ref)


@functools.partial(jax.jit, static_argnames=("n", "axis_plan"))
def _conv_rows_pallas(rows: jnp.ndarray, n: int, axis_plan) -> jnp.ndarray:
    """Circular-convolve every length-``n`` row by the axis kernel spectrum."""
    r = rows.shape[0]
    n1, n2 = _factor(n)
    _, _, (f1re_, f1im_), (f2re_, f2im_), (twre_, twim_) = _stage_consts(n)

    # pick the complex-row block so a (rb, n) f32 plane stays ~2 MB
    rb = max(8, min(128, (2 << 20) // (4 * n)))
    r2 = (r + 1) // 2
    r2p = -(-r2 // rb) * rb
    x = jnp.pad(rows, [(0, 2 * r2p - r), (0, 0)])
    # pre-rotate to (.., n2, n1) in HBM (cheap XLA transpose, fused with the
    # pad) so the kernel's stage-1 lane contraction needs no VMEM relayout
    x3 = jnp.swapaxes(x.reshape(2 * r2p, n1, n2), 1, 2)

    hre, him = _perm_spectrum_c(axis_plan, n)
    consts = [
        _stack_bf16(_c2r_mat(f1re_, f1im_)),
        _stack_bf16(_c2r_mat(f2re_, f2im_)),
        _stack_bf16(_c2r_mat(f2re_, f2im_, conj=True)),
        _stack_bf16(_c2r_mat(f1re_, f1im_, conj=True, scale=1.0 / n)),
        jnp.asarray(twre_), jnp.asarray(twim_),
        jnp.asarray(twre_.T), jnp.asarray(twim_.T),
    ]
    if him is None:
        # symmetric: one tiled-[re | im] multiply in the kernel
        consts.append(jnp.asarray(np.concatenate([hre, hre], axis=-1)))
    else:
        consts.extend([jnp.asarray(hre), jnp.asarray(him)])

    blk = lambda off: pl.BlockSpec(
        (rb, n2, n1), lambda i, off=off: (i + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cmat = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    steps = r2p // rb

    ore, oim = pl.pallas_call(
        functools.partial(
            _kernel, n1=n1, n2=n2, rb=rb, complex_h=him is not None
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        grid=(steps,),
        in_specs=[blk(0), blk(steps)] + [cmat(c.shape) for c in consts],
        out_specs=(
            pl.BlockSpec((rb, n2, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n2, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r2p, n2, n1), jnp.float32),
            jax.ShapeDtypeStruct((r2p, n2, n1), jnp.float32),
        ),
    )(x3, x3, *consts)

    # undo the pre-rotation in HBM and flatten back to rows
    ore = jnp.swapaxes(ore, 1, 2).reshape(r2p, n)
    oim = jnp.swapaxes(oim, 1, 2).reshape(r2p, n)
    out = jnp.concatenate([ore, oim], axis=0)
    return out[:r]


def fft_conv_rows(rows: jnp.ndarray, n: int, axis_plan) -> jnp.ndarray:
    """Public wrapper: (R, n) real f32 rows -> circularly convolved rows."""
    return _conv_rows_pallas(rows, n, axis_plan)


@functools.partial(jax.jit, static_argnames=("n", "axis_plan"))
def _conv_rows_pallas_framed(rows: jnp.ndarray, n: int, axis_plan):
    """Blur UNPADDED length-``dim`` rows: framing happens in the kernel.

    Input/output are ``(R, dim)``; reflect-101 pad, zero extension to
    ``n``, rotation, transform, un-rotation and interior crop all run in
    VMEM (``_kernel_framed``), so the only HBM traffic is one read and
    one write of the unpadded rows.
    """
    r, dim = rows.shape
    pad = axis_plan.pad
    # swapped factors (n // 128, 128): the kernel's lane->sublane unfold
    # slices the padded row in 128-lane chunks, which is the alignment
    # Mosaic can statically prove for dynamic lane offsets (k * 128)
    n1, n2 = n // 128, 128
    _, _, (f1re_, f1im_), (f2re_, f2im_), (twre_, twim_) = _stage_consts(
        n, (n1, n2)
    )

    # same working-set budget as the pre-rotated form (the framed padded
    # planes are built transiently in VMEM at the same (rb, n) size);
    # rounded to a multiple of 8 — the framed form's blocks are 2-D
    # (rb, dim), so rb is a sublane dim under the (8, 128) tiling rule
    rb = max(8, min(128, ((2 << 20) // (4 * n)) // 8 * 8))
    r2 = (r + 1) // 2
    r2p = -(-r2 // rb) * rb
    x = rows if 2 * r2p == r else jnp.pad(rows, [(0, 2 * r2p - r), (0, 0)])
    if pad:
        # Mosaic has no lane-reverse: XLA builds the thin pre-reversed
        # reflect-101 edge strips [left | right], (R, 2*pad) — the only
        # padded intermediate left in HBM (2*pad/dim of a frame copy)
        edges = jnp.concatenate(
            [
                jnp.flip(x[:, 1:pad + 1], axis=-1),
                jnp.flip(x[:, dim - 1 - pad:dim - 1], axis=-1),
            ],
            axis=-1,
        )

    hre, him = _perm_spectrum_c(axis_plan, n, (n1, n2))
    consts = [
        _stack_bf16(_c2r_mat(f1re_, f1im_)),
        _stack_bf16(_c2r_mat(f2re_, f2im_)),
        _stack_bf16(_c2r_mat(f2re_, f2im_, conj=True)),
        _stack_bf16(_c2r_mat(f1re_, f1im_, conj=True, scale=1.0 / n)),
        jnp.asarray(twre_), jnp.asarray(twim_),
        jnp.asarray(twre_.T), jnp.asarray(twim_.T),
    ]
    if him is None:
        consts.append(jnp.asarray(np.concatenate([hre, hre], axis=-1)))
    else:
        consts.extend([jnp.asarray(hre), jnp.asarray(him)])

    blk = lambda off, lanes: pl.BlockSpec(
        (rb, lanes), lambda i, off=off: (i + off, 0),
        memory_space=pltpu.VMEM,
    )
    cmat = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    steps = r2p // rb

    operands = [x, x]
    in_specs = [blk(0, dim), blk(steps, dim)]
    if pad:
        operands += [edges, edges]
        in_specs += [blk(0, 2 * pad), blk(steps, 2 * pad)]
    operands += consts
    in_specs += [cmat(c.shape) for c in consts]

    ore, oim = pl.pallas_call(
        functools.partial(
            _kernel_framed, n1=n1, n2=n2, rb=rb, dim=dim, pad=pad,
            complex_h=him is not None,
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rb, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r2p, dim), jnp.float32),
            jax.ShapeDtypeStruct((r2p, dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, n1 * n2), jnp.float32),  # row_re
            pltpu.VMEM((rb, n1 * n2), jnp.float32),  # row_im
            pltpu.VMEM((rb, n1, n2), jnp.float32),   # cube_re
            pltpu.VMEM((rb, n1, n2), jnp.float32),   # cube_im
        ],
    )(*operands)

    return jnp.concatenate([ore, oim], axis=0)[:r]


def conv_axis_framed(x: jnp.ndarray, axis_plan, axis: int) -> jnp.ndarray:
    """Per-axis blur through the in-kernel-framing form (TPU fast path).

    Mirrors ``ops/fft_mxu.conv_axis`` semantics exactly (same reflect-101
    + trailing-zero framing, same transform length) but materializes no
    padded intermediate in HBM.
    """
    if axis_plan.support_radius == 0:
        return x
    from blur_algorithms_tpu.ops.fft_mxu import conv_axis, transform_length

    n = transform_length(axis_plan)
    if not framed_applicable(n):
        # small transforms: Mosaic's shape-cast inference rejects the
        # in-kernel lane-split reshape when n1 < a full 128-lane vreg;
        # the pre-rotated-HBM form serves (these are fast anyway)
        return conv_axis(x, axis_plan, axis, _conv_rows_pallas)
    dim = axis_plan.dim
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    out = _conv_rows_pallas_framed(x.reshape(-1, dim), n, axis_plan)
    return jnp.moveaxis(out.reshape(lead + (dim,)), -1, axis)


def framed_applicable(n: int) -> bool:
    """The in-kernel-framing form factorizes ``n = (n // 128) * 128`` so
    its lane->sublane unfold runs on provably-128-aligned dynamic lane
    offsets (a Mosaic requirement). It serves every wide-radius
    production length (all are multiples of 128 past 4096 —
    ``transform_length``); shorter transforms keep the pre-rotated-HBM
    form, whose stage-1 factor stays near sqrt(n)."""
    return n % 128 == 0 and n // 128 >= 32


# In-kernel framing (round-5): the wide-radius lever, ROUTED ON by the
# interleaved A/B (benchmarks/fft_mxu_framing_ab.json, 67 MP frame):
# r=531 80.1 -> 55.6 ms, r=2046 97.7 -> 67.7, r=3328 109.4 -> 70.2
# (1.44-1.56x; 1.84 -> 2.87 GP/s at the old regime floor), u8 gate max
# err 0 vs the pocketfft oracle at the smallest framed geometry. Small
# transforms (framed_applicable False) keep the pre-rotated-HBM form;
# off-TPU the einsum twin remains the portable fallback.
_FRAMED = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _blur_fft_mxu_pallas_diff(planar, plan):
    from blur_algorithms_tpu.ops.fft_mxu import conv_axis

    if _FRAMED:
        out = conv_axis_framed(planar, plan.row, -1)
        return conv_axis_framed(out, plan.col, -2)
    out = conv_axis(planar, plan.row, -1, _conv_rows_pallas)
    return conv_axis(out, plan.col, -2, _conv_rows_pallas)


def _fft_mxu_fwd(planar, plan):
    return _blur_fft_mxu_pallas_diff(planar, plan), None


def _fft_mxu_bwd(plan, _res, ct):
    # blur is linear and engine-independent: the VJP is the same explicit
    # adjoint operator every Pallas engine uses (ops/adjoint.py)
    from blur_algorithms_tpu.ops.adjoint import blur_adjoint

    return (blur_adjoint(ct, plan),)


_blur_fft_mxu_pallas_diff.defvjp(_fft_mxu_fwd, _fft_mxu_bwd)


def blur_fft_mxu_pallas(planar: jnp.ndarray, plan) -> jnp.ndarray:
    """Separable MXU FFT-convolution blur of float32 planar ``(..., H, W)``.

    Radius-independent: the engine for kernel support radii past the banded
    matmul paths' crossover (~r=2560). Differentiable via the explicit
    adjoint ``custom_vjp`` (Pallas kernels have no automatic transpose).
    Off TPU this lowers through the Pallas interpreter only in tests; use
    ``ops/fft_mxu.blur_fft_mxu`` (the einsum form) as the portable fallback.
    """
    return _blur_fft_mxu_pallas_diff(planar.astype(jnp.float32), plan)
