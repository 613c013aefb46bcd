#!/usr/bin/env python
"""Micro-benchmark: Pallas MXU dot cost vs M-dimension and precision.

The fused PIC kernel's dots are (M=W, K=W^2, N=P) per tile; W=16 leaves the
128-row systolic array ~12% occupied.  This measures the same total-MAC
workload at M in {16, 64, 128} and f32 vs bf16 inputs to quantify the win of
x-long tiles before committing to the TileSpec refactor.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pull(a):
    return float(a[(0,) * a.ndim])


def make(m, k, n, nt, dtype, reps_inner):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            # fold the loop index in so the dot can't be hoisted
            return acc + jax.lax.dot_general(
                a_ref[0] + i.astype(a_ref.dtype) * 0.0, b_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        o_ref[0] = jax.lax.fori_loop(
            0, reps_inner, body, jnp.zeros((m, n), jnp.float32)
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nt, m, n), jnp.float32),
    )


def timeit(fn, *args, rtt):
    out = fn(*args)
    pull(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn(*args)
        pull(out)
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9) / 2)
    return best


def main():
    print(f"device={jax.devices()[0]}")
    x = jnp.ones((8, 128), jnp.float32)
    pull(x)
    rtt = min(
        (lambda t0: (pull(x), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"rtt={rtt*1e3:.2f}ms")
    # compute-bound: tiny nt, operands VMEM-resident, many inner reps
    # (~1e12 MACs per call so the ~40ms tunnel RTT is <10% of the span)
    nt = 8
    base_macs = 16 * 256 * 2048 * 256 * 256
    for dtype in (jnp.float32, jnp.bfloat16):
        for m, k, n in (
            (16, 256, 2048),
            (64, 256, 2048),
            (128, 256, 2048),
            (8, 256, 2048),
            (128, 2048, 256),
        ):
            ri = max(1, base_macs // (m * k * n * nt))
            f = make(m, k, n, nt, dtype, ri)
            a = jnp.ones((nt, m, k), dtype)
            b = jnp.ones((nt, k, n), dtype)
            t = timeit(jax.jit(f), a, b, rtt=rtt)
            tf = 2 * (m * k * n * nt * ri) / t / 1e12
            print(f"dtype={dtype.__name__:8s} M={m:4d} K={k:4d} N={n:5d} "
                  f"nt={nt:3d} inner={ri}: {t*1e3:7.3f} ms  {tf:7.1f} TFLOP/s",
                  flush=True)


if __name__ == "__main__":
    main()
