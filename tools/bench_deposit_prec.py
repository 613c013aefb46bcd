#!/usr/bin/env python
"""Micro-benchmark: deposit-shaped MXU dot cost vs precision mode.

The fused kernel's 3D deposit is lhs (W, P) . rhs (W*W, P) contracted over
the particle lanes: M=16, K=P, N=256.  'mixed'/'f32' modes run it at
precision=HIGHEST on f32 operands; this measures what Mosaic actually
charges for HIGHEST vs HIGH vs DEFAULT vs pre-cast bf16 at these shapes,
and how the cost scales with M (the 128-row systolic array is ~12% occupied
at M=16).
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = {
    "HIGHEST": jax.lax.Precision.HIGHEST,
    "HIGH": jax.lax.Precision.HIGH,
    "DEFAULT": None,
}


def pull(a):
    return float(a[(0,) * a.ndim])


def make(m, k, n, dtype, prec, reps_inner, nt=8, three_pass=False):
    cast = dtype

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[0].astype(cast)
        b = b_ref[0].astype(cast)

        if three_pass:
            # manual bf16_3x: hi/lo split, drop the lo*lo term (~2^-18 rel)
            def body(i, acc):
                ai = a + i.astype(cast) * 0.0
                a_hi = ai.astype(jnp.bfloat16)
                a_lo = (ai - a_hi.astype(cast)).astype(jnp.bfloat16)
                b_hi = b.astype(jnp.bfloat16)
                b_lo = (b - b_hi.astype(cast)).astype(jnp.bfloat16)
                dims = (((1,), (1,)), ((), ()))
                kw = dict(preferred_element_type=jnp.float32)
                return (acc
                        + jax.lax.dot_general(a_hi, b_hi, dims, **kw)
                        + jax.lax.dot_general(a_hi, b_lo, dims, **kw)
                        + jax.lax.dot_general(a_lo, b_hi, dims, **kw))
        else:
            def body(i, acc):
                ai = (a_ref[0] + i.astype(jnp.float32) * 0.0).astype(cast)
                return acc + jax.lax.dot_general(
                    ai, b,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
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
                pl.BlockSpec((1, n, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nt, m, n), jnp.float32),
    )


def timeit(fn, a, b, rtt):
    out = fn(a, b)
    pull(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn(a, b)
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
    k = 1152
    nt = 8
    reps = 400
    for (m, n, label) in ((16, 256, "deposit3d"), (128, 256, "deposit3d-M128"),
                          (64, 256, "deposit3d-M64"),
                          (32, 1152, "gatherT")):
        a = jnp.ones((nt, m, k), jnp.float32) * 0.5
        b = jnp.ones((nt, n, k), jnp.float32) * 0.5
        macs = nt * reps * m * n * k
        for mode in ("HIGHEST", "DEFAULT"):
            f = make(m, k, n, jnp.float32, _PREC[mode], reps, nt)
            t = timeit(f, a, b, rtt)
            print(f"{label:16s} f32/{mode:8s}: {t*1e3:8.3f} ms "
                  f"({macs/t/1e12:6.2f} Tmac/s)")
        f = make(m, k, n, jnp.float32, None, reps, nt, three_pass=True)
        t = timeit(f, a, b, rtt)
        print(f"{label:16s} 3-pass      : {t*1e3:8.3f} ms "
              f"({macs/t/1e12:6.2f} Tmac/s)")
        f = make(m, k, n, jnp.bfloat16, None, reps, nt)
        t = timeit(f, a, b, rtt)
        print(f"{label:16s} bf16-cast   : {t*1e3:8.3f} ms "
              f"({macs/t/1e12:6.2f} Tmac/s)")

    # 2D deposit: batched (4, W, K)x(4, W, K) vs stacked (4W, K)x(4W, K)
    # (the stacked form computes 16 blocks to use 4 — but may ride ONE
    # MXU tile-pass instead of 4)
    w = 16
    for dtype, lbl in ((jnp.float32, "f32/HIGHEST"), (jnp.bfloat16, "bf16")):
        prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

        def kb(a_ref, b_ref, o_ref):
            a = a_ref[0].astype(dtype)
            b = b_ref[0].astype(dtype)

            def body(i, acc):
                ai = (a_ref[0] + i.astype(jnp.float32) * 0.0).astype(dtype)
                return acc + jax.lax.dot_general(
                    ai, b, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec,
                )

            o_ref[0] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros((4, w, w), jnp.float32))

        fb = pl.pallas_call(
            kb,
            grid_spec=pl.GridSpec(
                grid=(nt,),
                in_specs=[pl.BlockSpec((1, 4, w, k), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((1, 4, w, w), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nt, 4, w, w), jnp.float32),
        )
        a = jnp.ones((nt, 4, w, k), jnp.float32) * 0.5
        t = timeit(fb, a, a, rtt)
        macs = nt * reps * 4 * w * w * k
        print(f"dep2d-batch4     {lbl:12s}: {t*1e3:8.3f} ms "
              f"({macs/t/1e12:6.2f} Tmac/s useful)")

        def ks(a_ref, b_ref, o_ref):
            b = b_ref[0].astype(dtype)

            def body(i, acc):
                ai = (a_ref[0] + i.astype(jnp.float32) * 0.0).astype(dtype)
                return acc + jax.lax.dot_general(
                    ai, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )

            o_ref[0] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros((4 * w, 4 * w), jnp.float32))

        fs = pl.pallas_call(
            ks,
            grid_spec=pl.GridSpec(
                grid=(nt,),
                in_specs=[pl.BlockSpec((1, 4 * w, k), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((1, 4 * w, 4 * w), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nt, 4 * w, 4 * w), jnp.float32),
        )
        a = jnp.ones((nt, 4 * w, k), jnp.float32) * 0.5
        t = timeit(fs, a, a, rtt)
        print(f"dep2d-stack64    {lbl:12s}: {t*1e3:8.3f} ms "
              f"({macs/t/1e12:6.2f} Tmac/s useful)")


if __name__ == "__main__":
    main()
