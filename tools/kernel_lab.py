#!/usr/bin/env python
"""Kernel lab: ablation timings for the fused PIC kernel (ops/pallas_pic.py).

Variants of the same grid/window/particle shapes isolate cost centers:
  full    — faithful copy of the production kernel structure
  nomxu   — dot_generals replaced by cheap per-row reductions (VPU kept)
  novpu   — band builds replaced by constant arrays (MXU kept)
  bf16    — MXU operands cast to bf16 (accumulate f32)
  empty   — memory traffic only (copy in->out)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
W = int(_os.environ.get("LAB_W", 16))
P = int(_os.environ.get("LAB_P", 2048))
NT = int(_os.environ.get("LAB_NT", 512))
ORDER = 1


def pull(arr):
    return float(arr[(0,) * arr.ndim])


def timeit(fn, *args, rtt=0.035):
    out = fn(*args)
    pull(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    pull(jax.tree_util.tree_leaves(out)[0])
    rough = max((time.perf_counter() - t0) / 3, 1e-5)
    reps = max(5, min(200, int((10 * max(rtt, 0.02)) / rough)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        pull(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0 - rtt) / reps)
    return best


def spline1(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def make_kernel(mode):
    f = jnp.float32
    mx = jnp.bfloat16 if mode == "bf16" else f
    gprec = dprec = None
    if mode.startswith("prec_"):
        levels = {"d": "default", "h": "high", "x": "highest"}
        gprec = levels[mode[5]]
        dprec = levels[mode[6]]
    if mode == "split3":
        gprec = "default"  # 1-pass bf16 gather + 3-pass deposit

    def kernel(exw, eyw, ezw, bxw, byw, bzw,
               xr, yr, zr, uxr, uyr, uzr, wr,
               xo, yo, zo, uxo, uyo, uzo,
               jxw, jyw, jzw):
        pos = (xr[0], yr[0], zr[0])  # (1, P) planes
        if mode == "empty":
            for src, dst in ((pos[0], xo), (pos[1], yo), (pos[2], zo)):
                dst[0] = src * 1.0001
            uxo[0] = uxr[0] + wr[0]
            uyo[0] = uyr[0] + wr[0]
            uzo[0] = uzr[0] + wr[0]
            jxw[0] = exw[0] + bxw[0]
            jyw[0] = eyw[0] + byw[0]
            jzw[0] = ezw[0] + bzw[0]
            return
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, P), 0).astype(f)

        def band(xc, o):
            if mode == "novpu":
                return (xc - rows) * 0.25
            xi = xc - rows
            if o == 0:
                return jnp.where((xi >= -0.5) & (xi < 0.5), 1.0, 0.0
                                 ).astype(f)
            return spline1(xi)

        X = [pos[d] * 0.1 for d in range(3)]
        acache = {}

        def axis_mat(d, o, stag):
            k = (d, o, stag)
            if k not in acache:
                acache[k] = band(X[d] - (0.5 if stag else 0.0), o)
            return acache[k]

        bcache = {}

        def yz_mat(yk, zk):
            k = (yk, zk)
            if k not in bcache:
                ay = axis_mat(1, *yk)
                az = axis_mat(2, *zk)
                bcache[k] = (
                    ay[:, None, :] * az[None, :, :]
                ).reshape(W * W, P).astype(mx)
            return bcache[k]

        keysets = [  # order-1 Yee galerkin unique keys per component
            (((0, True), (1, False), (1, False)), "Ex"),
            (((1, False), (0, True), (1, False)), "Ey"),
            (((1, False), (1, False), (0, True)), "Ez"),
            (((1, False), (0, True), (0, True)), "Bx"),
            (((0, True), (1, False), (0, True)), "By"),
            (((0, True), (0, True), (1, False)), "Bz"),
        ]
        e6 = []
        for (kx, ky, kz), comp in keysets:
            win = {"Ex": exw, "Ey": eyw, "Ez": ezw,
                   "Bx": bxw, "By": byw, "Bz": bzw}[comp]
            byz = yz_mat(ky, kz)
            if mode == "nomxu":
                h = byz[:W, :] + win[0][:, 0:1]
            else:
                h = jax.lax.dot_general(
                    win[0].astype(mx), byz, (((1,), (0,)), ((), ())),
                    preferred_element_type=f, precision=gprec,
                )
            ax_m = axis_mat(0, *kx)
            e6.append(jnp.sum(ax_m * h, axis=0, keepdims=True))
        ex, ey, ez, bx, by, bz = e6

        # Boris-ish push (same op mix)
        q_m = 1.7e11 * 0.5e-12
        ux = uxr[0] + q_m * ex
        uy = uyr[0] + q_m * ey
        uz = uzr[0] + q_m * ez
        tx, ty, tz = q_m * bx, q_m * by, q_m * bz
        upx = ux + uy * tz - uz * ty
        upy = uy + uz * tx - ux * tz
        upz = uz + ux * ty - uy * tx
        s = 2.0 / (1.0 + tx * tx + ty * ty + tz * tz)
        ux = ux + (upy * tz - upz * ty) * s + q_m * ex
        uy = uy + (upz * tx - upx * tz) * s + q_m * ey
        uz = uz + (upx * ty - upy * tx) * s + q_m * ez
        gaminv = jax.lax.rsqrt(1.0 + (ux * ux + uy * uy + uz * uz) * 1e-17)
        vel = (ux * gaminv, uy * gaminv, uz * gaminv)
        xo[0] = pos[0] + vel[0] * 1e-12
        yo[0] = pos[1] + vel[1] * 1e-12
        zo[0] = pos[2] + vel[2] * 1e-12
        uxo[0] = ux
        uyo[0] = uy
        uzo[0] = uz

        wq = wr[0]
        sm, df, cs = [], [], []
        for d in range(3):
            xn = X[d] + vel[d] * 1e-4
            nn = band(xn, ORDER)
            no = axis_mat(d, ORDER, False)
            sm.append(nn + no)
            diff = no - nn
            df.append(diff)
            acc = diff
            s2 = 1
            while s2 < W:
                acc = acc + jnp.pad(acc[:-s2], ((s2, 0), (0, 0)))
                s2 *= 2
            cs.append(acc)

        def outer(a, b):
            return (a[:, None, :] * b[None, :, :]).reshape(W * W, P
                                                           ).astype(mx)

        for d, (a, b, out_ref) in enumerate(
            ((1, 2, jxw), (0, 2, jyw), (0, 1, jzw))
        ):
            lhs = cs[d] * wq
            if mode == "nomxu":
                jd = jnp.sum(lhs, axis=1, keepdims=True) + outer(
                    sm[a], sm[b]
                )[:W, : W * W].astype(f)
            elif mode == "split3":
                # near-f32 deposit via 3 bf16 passes: a·b ≈ ahi·bhi +
                # alo·bhi + ahi·blo (error ~2^-16 of each operand)
                def dot3(a_, b_):
                    ahi = a_.astype(jnp.bfloat16)
                    alo = (a_ - ahi.astype(f)).astype(jnp.bfloat16)
                    bhi = b_.astype(jnp.bfloat16)
                    blo = (b_ - bhi.astype(f)).astype(jnp.bfloat16)
                    dn = (((1,), (1,)), ((), ()))
                    return (
                        jax.lax.dot_general(
                            ahi, bhi, dn, preferred_element_type=f)
                        + jax.lax.dot_general(
                            alo, bhi, dn, preferred_element_type=f)
                        + jax.lax.dot_general(
                            ahi, blo, dn, preferred_element_type=f)
                    )

                jd = dot3(0.25 * lhs, outer(sm[a], sm[b]).astype(f)) + dot3(
                    (1.0 / 12.0) * lhs, outer(df[a], df[b]).astype(f)
                )
            else:
                jd = jax.lax.dot_general(
                    (0.25 * lhs).astype(mx), outer(sm[a], sm[b]),
                    (((1,), (1,)), ((), ())), preferred_element_type=f,
                    precision=dprec,
                ) + jax.lax.dot_general(
                    ((1.0 / 12.0) * lhs).astype(mx), outer(df[a], df[b]),
                    (((1,), (1,)), ((), ())), preferred_element_type=f,
                    precision=dprec,
                )
            out_ref[0] = jd

    return kernel


def make_packed_kernel(mode):
    """Same op mix, but ONE packed particle in-ref / out-ref and one packed
    window/J ref — isolates per-grid-step BlockSpec DMA overhead."""
    inner = make_kernel(mode if mode != "pk_empty" else "empty")

    def kernel(wins, pin, pout, jout):
        class Row:
            def __init__(self, ref, i):
                self.ref, self.i = ref, i

            def __getitem__(self, _):
                return self.ref[0, self.i]

            def __setitem__(self, _, v):
                self.ref[0, self.i] = v
        ins = [Row(pin, i) for i in range(7)]
        outs = [Row(pout, i) for i in range(6)]
        jws = [Row(jout, i) for i in range(3)]
        ws = [Row(wins, i) for i in range(6)]
        inner(*ws, *ins, *outs, *jws)

    return kernel


def run(mode):
    f = jnp.float32
    rng = np.random.default_rng(0)
    npart = NT * P
    if mode.startswith("pk_"):
        wins = jnp.asarray(rng.normal(size=(NT, 6, W, W * W)), f)
        parts = jnp.asarray(rng.random(size=(NT, 7, 1, P)), f)
        win_spec = pl.BlockSpec((1, 6, W, W * W), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        jw_spec = pl.BlockSpec((1, 3, W, W * W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        pin_spec = pl.BlockSpec((1, 7, 1, P),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        pout_spec = pl.BlockSpec((1, 6, 1, P),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            make_packed_kernel(mode[3:] if mode != "pk_empty" else mode),
            grid=(NT,),
            in_specs=[win_spec, pin_spec],
            out_specs=[pout_spec, jw_spec],
            out_shape=[
                jax.ShapeDtypeStruct((NT, 6, 1, P), f),
                jax.ShapeDtypeStruct((NT, 3, W, W * W), f),
            ],
        )
        fn = jax.jit(lambda *a: call(*a))
        t = timeit(fn, wins, parts)
        print(f"{mode:8s}: {t*1e3:7.3f} ms   {t/npart*1e9:6.2f} ns/p")
        return
    wins = tuple(jnp.asarray(rng.normal(size=(NT, W, W * W)), f)
                 for _ in range(6))
    parts = tuple(jnp.asarray(rng.random(size=(NT, 1, P)), f)
                  for _ in range(7))
    win_spec = pl.BlockSpec((1, W, W * W), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_kernel(mode),
        grid=(NT,),
        in_specs=[win_spec] * 6 + [part_spec] * 7,
        out_specs=[part_spec] * 6 + [win_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((NT, 1, P), f)] * 6
        + [jax.ShapeDtypeStruct((NT, W, W * W), f)] * 3,
    )
    fn = jax.jit(lambda *a: call(*a))
    t = timeit(fn, *wins, *parts)
    print(f"{mode:8s}: {t*1e3:7.3f} ms   {t/npart*1e9:6.2f} ns/p")


def main():
    print(f"device={jax.devices()[0]}  W={W} P={P} NT={NT} "
          f"(= {NT*P/1e6:.1f}M slots)")
    import sys as _sys
    modes = _sys.argv[1:] or (
        "empty", "full", "pk_empty", "pk_full", "empty")
    for mode in modes:
        run(mode)


if __name__ == "__main__":
    main()
