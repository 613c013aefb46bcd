"""Fused gather + push + Esirkepov-deposit Pallas TPU kernel (3D).

One grid step processes one particle tile entirely in VMEM: the reference's
two hot loops — PushPX (gather+push, PhysicalParticleContainer.cpp:2550) and
DepositCurrent (CurrentDeposition.H:643 doEsirkepovDepositionShapeN) — fused
into a single kernel over the tile-binned layout of ops/tiling.py.

TPU-native formulation: per-particle shape weights become dense one-hot
matrices over the tile window (W grid points per dim), so

  * gather is an MXU contraction  G1[(jk),p] = sum_i Ewin[(jk),i] * Ax[i,p]
    followed by a VPU reduction with the outer-product weight matrix
    B = Ay (x) Az, replacing the reference's per-particle random access;
  * deposition is an MXU contraction over the particle axis
    J[(jk),i] = sum_p Tyz[(jk),p] * Cx[i,p], replacing atomicAdd scatter
    (the design analog of the reference's shared-memory binned deposition,
    WarpXParticleContainer.cpp:490-548).

No scatter/gather primitives appear anywhere; all indexing is one-hot
comparisons against iota, so out-of-window particles (drift beyond the rebin
margin) contribute zero and are counted in the per-tile violation output
instead of corrupting memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .push import PUSHERS
from .shapes import spline, start_index
from ..constants import c as _c

__all__ = ["binned_push_deposit"]

_GALERKIN_AXES = {
    "Ex": ("x",),
    "Ey": ("y",),
    "Ez": ("z",),
    "Bx": ("y", "z"),
    "By": ("x", "z"),
    "Bz": ("x", "y"),
}

_AXES = ("x", "y", "z")


def _build_kernel(spec, geom, staggering, order, galerkin, pusher_name, dt,
                  dtype):
    import os

    dbg_skip_gather = os.environ.get("WTPU_SKIP_GATHER", "0") == "1"
    dbg_skip_deposit = os.environ.get("WTPU_SKIP_DEPOSIT", "0") == "1"
    dbg_dot_bf16 = os.environ.get("WTPU_DOT_BF16", "0") == "1"
    dbg_skip_onehot = os.environ.get("WTPU_SKIP_ONEHOT", "0") == "1"
    W, P, T = spec.w, spec.p_max, order + 3
    ntx, nty, ntz = spec.tiles_per_dim
    tdims = spec.tile
    dx = geom.dx
    lo = geom.prob_lo
    inv_dx = tuple(1.0 / d for d in dx)
    invdtd = (
        1.0 / (dt * dx[1] * dx[2]),
        1.0 / (dt * dx[0] * dx[2]),
        1.0 / (dt * dx[0] * dx[1]),
    )
    pusher = PUSHERS[pusher_name]
    inv_c2 = 1.0 / (_c * _c)
    f = dtype

    def kernel(params, exw, eyw, ezw, bxw, byw, bzw,
               xr, yr, zr, uxr, uyr, uzr, wr,
               xo, yo, zo, uxo, uyo, uzo,
               jxw, jyw, jzw, violr):
        q = params[0, 0]
        m = params[0, 1]
        tid = pl.program_id(0)
        t0 = tid // (nty * ntz)
        rem = tid - t0 * (nty * ntz)
        t1 = rem // ntz
        t2 = rem - t1 * ntz
        worig = (t0 * tdims[0] - spec.off,
                 t1 * tdims[1] - spec.off,
                 t2 * tdims[2] - spec.off)
        # particle blocks arrive as (1, P//128, 128); flatten to (P,)
        # (physically the same sublane x lane layout — free in Mosaic)
        pos = (xr[0].reshape(P), yr[0].reshape(P), zr[0].reshape(P))
        X = [
            (pos[d] - lo[d]) * inv_dx[d] - worig[d].astype(f)
            for d in range(3)
        ]
        iota_wp = jax.lax.broadcasted_iota(jnp.int32, (W, P), 0)

        def onehot_t(i0, wts):
            """(W, P) matrix with wts[t] at window row i0+t (zero outside)."""
            if dbg_skip_onehot:
                # debug: skip the scatter-free placement (wrong physics)
                acc = jnp.zeros((W, P), f)
                for t_, wt in enumerate(wts):
                    acc = acc.at[t_ % W].set(wt) if False else acc + wt[None, :] * (1.0 / W)
                return acc
            acc = jnp.zeros((W, P), f)
            for t_, wt in enumerate(wts):
                acc = acc + jnp.where(
                    iota_wp == (i0 + t_)[None, :], wt[None, :],
                    jnp.zeros((), f),
                )
            return acc

        # ---- gather ------------------------------------------------------
        acache = {}

        def gather_a(d, o_eff, stag):
            key_ = (d, o_eff, stag)
            if key_ not in acache:
                xc = X[d] - (0.5 if stag else 0.0)
                i0 = start_index(xc, o_eff)
                wts = [
                    spline(xc - (i0.astype(f) + t_), o_eff)
                    for t_ in range(o_eff + 1)
                ]
                acache[key_] = onehot_t(i0, wts)
            return acache[key_]

        e6 = []
        if dbg_skip_gather:
            zz = jnp.zeros((P,), f)
            e6 = [zz, zz, zz, zz, zz, zz]
        for comp, win in zip(
            [] if dbg_skip_gather else
            ("Ex", "Ey", "Ez", "Bx", "By", "Bz"),
            (exw, eyw, ezw, bxw, byw, bzw),
        ):
            flags = staggering[comp]
            amats = []
            for d in range(3):
                reduced = galerkin and (_AXES[d] in _GALERKIN_AXES[comp])
                o_eff = order - 1 if reduced else order
                amats.append(gather_a(d, o_eff, flags[d] == 0))
            # (W^2, P) = Ewin ((jk), i) contracted with Ax (i, p)
            g1 = jax.lax.dot_general(
                win[0], amats[0], (((1,), (0,)), ((), ())),
                preferred_element_type=f,
            )
            byz = (amats[1][:, None, :] * amats[2][None, :, :]).reshape(
                W * W, P
            )
            e6.append(jnp.sum(byz * g1, axis=0))
        ex, ey, ez, bx, by, bz = e6
        ex = ex + params[0, 2]
        ey = ey + params[0, 3]
        ez = ez + params[0, 4]
        bx = bx + params[0, 5]
        by = by + params[0, 6]
        bz = bz + params[0, 7]

        # ---- push ----------------------------------------------------------
        ux, uy, uz = pusher(
            uxr[0].reshape(P), uyr[0].reshape(P), uzr[0].reshape(P),
            ex, ey, ez, bx, by, bz, q, m, dt,
        )
        gaminv = 1.0 / jnp.sqrt(1.0 + (ux * ux + uy * uy + uz * uz) * inv_c2)
        vel = (ux * gaminv, uy * gaminv, uz * gaminv)
        sl = (P // 128, 128)
        xo[0] = (pos[0] + vel[0] * dt).reshape(sl)
        yo[0] = (pos[1] + vel[1] * dt).reshape(sl)
        zo[0] = (pos[2] + vel[2] * dt).reshape(sl)
        uxo[0] = ux.reshape(sl)
        uyo[0] = uy.reshape(sl)
        uzo[0] = uz.reshape(sl)

        # ---- Esirkepov deposit ---------------------------------------------
        # new position in window units; old = new - v*dt/dx (== X exactly)
        wq = q * wr[0].reshape(P)
        nn, no, cs, bad = [], [], [], None
        for d in range(3):
            xn = X[d] + vel[d] * (dt * inv_dx[d])
            i0 = start_index(xn, order) - 1
            base = i0.astype(f)
            sn = [spline(xn - (base + t_), order) for t_ in range(T)]
            so = [spline(X[d] - (base + t_), order) for t_ in range(T)]
            cum, acc = [], jnp.zeros((P,), f)
            for t_ in range(T):
                acc = acc + (so[t_] - sn[t_])
                cum.append(acc)
            nn.append(onehot_t(i0, sn))
            no.append(onehot_t(i0, so))
            cs.append(onehot_t(i0, cum))
            bd = (i0 < 0) | (i0 > W - T)
            bad = bd if bad is None else (bad | bd)

        third, sixth = 1.0 / 3.0, 1.0 / 6.0

        def mix(a, b):
            """Esirkepov transverse mix (CurrentDeposition.H:820 one_third/
            one_sixth combination) as a (W^2, P) matrix over dims (a, b)."""
            m_ = (
                (nn[a][:, None, :] * nn[b][None, :, :]
                 + no[a][:, None, :] * no[b][None, :, :]) * third
                + (nn[a][:, None, :] * no[b][None, :, :]
                   + no[a][:, None, :] * nn[b][None, :, :]) * sixth
            )
            return m_.reshape(W * W, P)

        for d, (a, b, out_ref) in enumerate(
            ((1, 2, jxw), (0, 2, jyw), (0, 1, jzw))
        ):
            if dbg_skip_deposit:
                out_ref[0] = jnp.zeros((W * W, W), f) + wq[0]
                continue
            lhs = mix(a, b)
            rhs = cs[d] * (wq * invdtd[d])[None, :]
            if dbg_dot_bf16:
                lhs = lhs.astype(jnp.bfloat16)
                rhs = rhs.astype(jnp.bfloat16)
            out_ref[0] = jax.lax.dot_general(
                lhs, rhs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32 if dbg_dot_bf16 else f,
            ).astype(f)

        alive = wr[0].reshape(P) > 0
        cnt = jnp.sum((bad & alive).astype(jnp.int32))
        violr[0] = jnp.broadcast_to(cnt, (8, 128))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "geom", "order", "galerkin", "pusher_name", "dt",
        "stag_items", "interpret",
    ),
)
def binned_push_deposit(
    params,
    windows6,
    parts7,
    *,
    spec,
    geom,
    order,
    galerkin,
    pusher_name,
    dt,
    stag_items,
    interpret=False,
):
    """Run the fused kernel over all tiles.

    params: (1, 8) [q, m, Eext(3), Bext(3)]; windows6: 6 x (n_tiles, W*W, W)
    field windows (extract_windows layout); parts7: (x, y, z, ux, uy, uz, w)
    each (n_tiles, p_max).

    Returns (new_parts6 (x,y,z,ux,uy,uz), (jx_w, jy_w, jz_w), violations):
    J windows are (n_tiles, W*W, W) with per-component axis orders
    ((y,z),x), ((x,z),y), ((x,y),z) — pass fold_windows axes=(1,2,0)/(0,2,1)/
    (0,1,2) respectively.  ``violations`` is (n_tiles,) int32 counting alive
    particles that drifted beyond the rebin margin (must be all zero).
    """
    staggering = dict(stag_items)
    dtype = parts7[0].dtype
    W, P, nt = spec.w, spec.p_max, spec.n_tiles
    kernel = _build_kernel(
        spec, geom, staggering, order, galerkin, pusher_name, dt, dtype
    )
    if P % 128:
        raise ValueError("p_max must be a multiple of 128")
    win_spec = pl.BlockSpec(
        (1, W * W, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    part_spec = pl.BlockSpec(
        (1, P // 128, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    parts7 = tuple(a.reshape(nt, P // 128, 128) for a in parts7)
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [win_spec] * 6
        + [part_spec] * 7,
        out_specs=[part_spec] * 6
        + [win_spec] * 3
        + [
            pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    out_shape = (
        [jax.ShapeDtypeStruct((nt, P // 128, 128), dtype)] * 6
        + [jax.ShapeDtypeStruct((nt, W * W, W), dtype)] * 3
        + [jax.ShapeDtypeStruct((nt, 8, 128), jnp.int32)]
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(params, *windows6, *parts7)
    return (
        tuple(o.reshape(nt, P) for o in outs[:6]),
        tuple(outs[6:9]),
        outs[9][:, 0, 0],
    )
