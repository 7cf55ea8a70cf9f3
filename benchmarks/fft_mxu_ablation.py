"""Ablation harness for the four-step MXU FFT kernel (fft4step.py).

Times structurally-identical kernel variants with stages disabled to locate
where the wall time goes (dots vs twiddles vs VMEM rotations vs load/store).
Variants produce WRONG numerical results (except 'full') — timing only.

Usage: python benchmarks/fft_mxu_ablation.py [--rows 8192] [--n 16384]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n1, n2, rb, mode):
    f32 = jnp.float32
    do_dots = "nodot" not in mode
    dots3 = "1dot" not in mode and do_dots
    do_rot = "norot" not in mode
    do_tw = "notw" not in mode

    def _kernel(xre_ref, xim_ref, f1f, f2f, f2i, f1i,
                tw_re, tw_im, twt_re, twt_im, h,
                ore_ref, oim_ref):
        def dot3(x, mref):
            xh = x.astype(jnp.bfloat16)
            d = lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
            if not do_dots:
                return x
            if not dots3:
                return d(xh, mref[0])
            xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
            return d(xh, mref[0]) + d(xh, mref[1]) + d(xl, mref[0])

        def cdot(xre, xim, mref, k):
            y = dot3(jnp.concatenate([xre, xim], axis=-1), mref)
            return y[:, :k], y[:, k:]

        def rot(re, im, a_len, b_len):
            if not do_rot:
                return (re.reshape(rb * b_len, a_len),
                        im.reshape(rb * b_len, a_len))
            re = jnp.swapaxes(re.reshape(rb, a_len, b_len), 1, 2)
            im = jnp.swapaxes(im.reshape(rb, a_len, b_len), 1, 2)
            return re.reshape(rb * b_len, a_len), im.reshape(rb * b_len, a_len)

        def ctw(re, im, wre, wim, a_len, b_len):
            if not do_tw:
                return re, im
            re3 = re.reshape(rb, a_len, b_len)
            im3 = im.reshape(rb, a_len, b_len)
            wre, wim = wre[...][None], wim[...][None]
            return (
                (re3 * wre - im3 * wim).reshape(rb * a_len, b_len),
                (re3 * wim + im3 * wre).reshape(rb * a_len, b_len),
            )

        xre = xre_ref[...].reshape(rb * n2, n1)
        xim = xim_ref[...].reshape(rb * n2, n1)
        are, aim = cdot(xre, xim, f1f, n1)
        are, aim = ctw(are, aim, twt_re, twt_im, n2, n1)
        are, aim = rot(are, aim, n2, n1)
        bre, bim = cdot(are, aim, f2f, n2)
        hh = h[...][None]
        b = jnp.concatenate([bre, bim], axis=-1).reshape(rb, n1, 2 * n2) * hh
        b = b.reshape(rb * n1, 2 * n2)
        c = dot3(b, f2i)
        cre, cim = c[:, :n2], c[:, n2:]
        cre, cim = ctw(cre, cim, tw_re, -tw_im[...], n1, n2)
        cre, cim = rot(cre, cim, n1, n2)
        yre, yim = cdot(cre, cim, f1i, n1)
        ore_ref[...] = yre.reshape(rb, n2, n1)
        oim_ref[...] = yim.reshape(rb, n2, n1)

    return _kernel


def run(rows, n, mode, iters=8):
    from blur_algorithms_tpu.ops.fft_mxu import _factor, _stage_consts
    from blur_algorithms_tpu.pallas_kernels.fft4step import (
        _c2r_mat,
        _stack_bf16,
    )
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    n1, n2 = _factor(n)
    _, _, (f1re_, f1im_), (f2re_, f2im_), (twre_, twim_) = _stage_consts(n)
    rb = max(8, min(128, (2 << 20) // (4 * n)))
    r2 = (rows + 1) // 2
    r2p = -(-r2 // rb) * rb
    consts = [
        _stack_bf16(_c2r_mat(f1re_, f1im_)),
        _stack_bf16(_c2r_mat(f2re_, f2im_)),
        _stack_bf16(_c2r_mat(f2re_, f2im_, conj=True)),
        _stack_bf16(_c2r_mat(f1re_, f1im_, conj=True, scale=1.0 / n)),
        jnp.asarray(twre_), jnp.asarray(twim_),
        jnp.asarray(twre_.T), jnp.asarray(twim_.T),
        jnp.asarray(np.ones((n1, 2 * n2), np.float32)),
    ]
    blk = lambda off: pl.BlockSpec(
        (rb, n2, n1), lambda i, off=off: (i + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cmat = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    steps = r2p // rb
    kern = make_kernel(n1, n2, rb, mode)

    @jax.jit
    def f(x3):
        ore, oim = pl.pallas_call(
            kern,
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
        # keep the chained step shape-preserving
        return jnp.concatenate([ore, oim], axis=0)[: 2 * r2p] * 1e-3

    x3 = jnp.zeros((2 * r2p, n2, n1), jnp.float32)

    def mk():
        return lambda v: f(v[: 2 * r2p])

    res = time_fn_chained(mk, x3, iters=iters, reps=3, name=mode)
    return res.median_ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=8192)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--modes", nargs="+", default=[
        "full", "norot", "notw", "norot_notw", "1dot", "nodot",
        "nodot_norot_notw",
    ])
    args = p.parse_args()
    print(f"rows={args.rows} n={args.n}")
    for mode in args.modes:
        ms = run(args.rows, args.n, mode)
        print(f"{mode:>18}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
