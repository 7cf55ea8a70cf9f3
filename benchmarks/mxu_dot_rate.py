"""MXU dot-rate microbench: what int8/bf16 rate can a VMEM-resident dot hit?

Answers the wide-radius headroom question: the fused DMA kernel's band
matmuls retire ~140-150 int8 TOP/s end to end at r=332-515 (PERF.md), and
earlier isolated measurements of band-shaped dots gave 172-203 TOP/s — but
the v5e datasheet MXU peak is ~394 int8 TOP/s. If a perfectly-shaped
VMEM-resident dot (M=N=K multiples of 128, no HBM traffic inside the
timed loop) also tops out near ~200, that IS the chip's effective ceiling
for dot_general-lowered matmuls and the kernel is near its roof; if
perfect shapes reach ~390, the band-dot SHAPES leave a ~2x uplift on the
table and a restructure (transposed cols pass, wider accumulation) is
worth building.

Method: one pallas_call, grid=(steps,); every grid step runs `inner`
chained dots on operands held in VMEM via constant-index BlockSpecs
(compiler can't hoist: each iteration feeds the next through a cheap
cast). Timed with the tunnel-safe chained-scan harness.

Usage: python benchmarks/mxu_dot_rate.py [--m 512] [--k 1024] [--n 512]
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


def make_fn(m, k, n, inner, dtype, steps):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        a0 = a_ref[...]
        b = b_ref[...]

        def body(i, a):
            acc = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            # feed the result back as the next lhs so the loop can't be
            # collapsed; the cast is VPU work, small next to the dot
            return acc[:, :k].astype(dtype) if n >= k else jnp.concatenate(
                [acc, a[:, n:]], axis=1
            ).astype(dtype)

        a = jax.lax.fori_loop(0, inner, body, a0)
        o_ref[...] = a.astype(acc_t)

    @jax.jit
    def f(a, b):
        out = pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20
            ),
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, k), acc_t),
        )(a, b)
        return out

    return f


def run(m, k, n, dtype, inner=None, steps=16, iters=4, name="dot"):
    from blur_algorithms_tpu.utils.timing import time_fn_chained

    if inner is None:
        # size the in-kernel loop so one call does ~0.5 TMAC (>= ~2.5 ms
        # even at peak rate) — small shapes otherwise finish inside the
        # chained-timing noise floor and report impossible TOP/s
        inner = max(16, int(5e11 / (m * k * n * steps)))
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-4, 4, (m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-4, 4, (k, n), dtype=np.int8))
    else:
        a = jnp.asarray(rng.normal(0, 1, (m, k)).astype(np.float32)).astype(dtype)
        b = jnp.asarray(rng.normal(0, 1, (k, n)).astype(np.float32)).astype(dtype)
    f = make_fn(m, k, n, inner, dtype, steps)

    def mk():
        # shape-preserving step over the (m, k) accumulator output
        def step(v):
            return f(v.astype(dtype), b).astype(jnp.float32) * 1e-6

        return step

    res = time_fn_chained(
        mk, a.astype(jnp.float32), iters=iters, reps=3,
        name=f"{name} m{m} k{k} n{n}",
    )
    macs = m * k * n * inner * steps
    tops = 2 * macs / (res.median_ms / 1e3) / 1e12
    if res.suspect:
        tops = float("nan")
    return res.median_ms, tops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inner", type=int, default=None)
    p.add_argument("--steps", type=int, default=16)
    args = p.parse_args()

    shapes = [
        # (m, k, n, label)
        (1024, 1024, 1024, "big cube"),
        # rows-band: does widening the output chunk lift the rate?
        (2048, 1152, 128, "rows-band r=512 cw=128"),
        (2048, 1280, 256, "rows-band r=512 cw=256"),
        (2048, 1408, 384, "rows-band r=512 cw=384"),
        (2048, 1536, 512, "rows-band r=512 cw=512"),
        # cols-band: output chunk is M — sweep it (K grows with ch too)
        (120, 1144, 384, "cols-band r=512 ch=120"),
        (240, 1264, 384, "cols-band r=512 ch=240"),
        (384, 1408, 384, "cols-band r=512 ch=384"),
        (512, 1536, 384, "cols-band r=512 ch=512"),
    ]
    for dtype, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
        for m, k, n, label in shapes:
            ms, tops = run(m, k, n, dtype, inner=args.inner,
                           steps=args.steps, name=name)
            print(f"{name} {label:24s} m={m:5d} k={k:5d} n={n:4d}: "
                  f"{ms:8.3f} ms  {tops:7.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
