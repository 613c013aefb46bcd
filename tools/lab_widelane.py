#!/usr/bin/env python
"""Microbench: batched (S, ., 128) dots vs wide-lane (., S*128) dots for the
fused kernel's gather/deposit contractions, measured as real Pallas kernels
over the bench grid (512 tiles, p_max=1280).

The production kernel batches every contraction over the S = p_max//128
particle planes (M=W=16 per instance).  The wide-lane alternative keeps the
particle axis fused in the lanes (N or K = p_max), turning each group into
ONE streaming matmul.  This lab measures both shapes in isolation.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 16
P = 1280
NT = 512
S = P // 128
HI = jax.lax.Precision.HIGHEST


def pull(a):
    return float(a[(0,) * a.ndim])


def timeit(fn, *args, rtt=0.04):
    out = fn(*args)
    pull(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    reps = 30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        pull(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0 - rtt) / reps)
    return best


def make(mode, prec, gmx):
    """mode: 'batched' or 'wide'.

    gather: 4 groups, win (mW, W*W) x byz -> h; deposit: 3 comps,
    lhs x rhs(W*W) -> (W, W*W).
    """
    f = jnp.float32

    def kernel_batched(win_ref, ay_ref, az_ref, lhs_ref, out_ref, jw_ref):
        ay = ay_ref[...]
        az = az_ref[...]
        byz = (ay[:, :, None, :] * az[:, None, :, :]).reshape(
            S, W * W, 128
        ).astype(gmx)
        acc = None
        for g in range(4):
            mW = 2 * W if g < 2 else W
            winb = jnp.broadcast_to(
                win_ref[0, :mW].astype(gmx), (S, mW, W * W)
            )
            h = jax.lax.dot_general(
                winb, byz, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f, precision=None,
            )
            r = jnp.sum(ay * h[:, :W], axis=1)
            acc = r if acc is None else acc + r
        out_ref[0] = acc
        jacc = None
        for c in range(3):
            lhs = lhs_ref[...]
            jds = jax.lax.dot_general(
                lhs, byz.astype(f) if prec is HI else byz,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f, precision=prec,
            )
            jd = jnp.sum(jds, axis=0)
            jacc = jd if jacc is None else jacc + jd
        jw_ref[0] = jacc

    def kernel_wide(win_ref, ay_ref, az_ref, lhs_ref, out_ref, jw_ref):
        # wide layout: bands (W, P), byz (W*W, P)
        ay = ay_ref[0]
        az = az_ref[0]
        byz = (ay[:, None, :] * az[None, :, :]).reshape(
            W * W, P
        ).astype(gmx)
        acc = None
        for g in range(4):
            mW = 2 * W if g < 2 else W
            h = jax.lax.dot_general(
                win_ref[0, :mW].astype(gmx), byz, (((1,), (0,)), ((), ())),
                preferred_element_type=f, precision=None,
            )
            r = jnp.sum(ay * h[:W], axis=0)
            acc = r if acc is None else acc + r
        out_ref[0, 0] = acc
        jacc = None
        for c in range(3):
            lhs = lhs_ref[0]
            jds = jax.lax.dot_general(
                lhs, byz.astype(f) if prec is HI else byz,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f, precision=prec,
            )
            jacc = jds if jacc is None else jacc + jds
        jw_ref[0] = jacc

    if mode == "batched":
        shapes = [
            ((NT, 2 * W, W * W), f),   # win stack
            ((S, W, 128), f), ((S, W, 128), f),  # ay, az (per tile, reused)
            ((S, W, 128), f),          # lhs
        ]
        outs = [
            jax.ShapeDtypeStruct((NT, S, 128), f),
            jax.ShapeDtypeStruct((NT, W, W * W), f),
        ]
        in_specs = [
            pl.BlockSpec((1, 2 * W, W * W), lambda i: (i, 0, 0)),
            pl.BlockSpec((S, W, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((S, W, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((S, W, 128), lambda i: (0, 0, 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, W * W), lambda i: (i, 0, 0)),
        ]
        kern = kernel_batched
    else:
        shapes = [
            ((NT, 2 * W, W * W), f),
            ((1, W, P), f), ((1, W, P), f),
            ((1, W, P), f),
        ]
        outs = [
            jax.ShapeDtypeStruct((NT, 1, P), f),
            jax.ShapeDtypeStruct((NT, W, W * W), f),
        ]
        in_specs = [
            pl.BlockSpec((1, 2 * W, W * W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, P), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, W, P), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, W, P), lambda i: (0, 0, 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, W, W * W), lambda i: (i, 0, 0)),
        ]
        kern = kernel_wide

    args = [jnp.ones(s, d) * 0.01 for s, d in shapes]
    fn = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
    )
    return jax.jit(lambda *a: fn(*a)), args


def main():
    print(f"device={jax.devices()[0]} W={W} P={P} NT={NT}")
    npart = NT * P
    for mode in ("batched", "wide"):
        for label, prec, gmx in (
            ("bf16-ops", None, jnp.bfloat16),
            ("f32-dep3x", HI, jnp.bfloat16),
        ):
            fn, args = make(mode, prec, gmx)
            t = timeit(fn, *args)
            print(f"{mode:8s} {label:10s}: {t*1e3:7.3f} ms "
                  f"{t/npart*1e9:5.2f} ns/p")


if __name__ == "__main__":
    main()
