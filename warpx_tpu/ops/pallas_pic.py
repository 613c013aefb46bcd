"""Fused gather + push + Esirkepov-deposit Pallas TPU kernel (3D).

One grid step processes one particle tile entirely in VMEM: the reference's
two hot loops — PushPX (gather+push, PhysicalParticleContainer.cpp:2550) and
DepositCurrent (CurrentDeposition.H:643 doEsirkepovDepositionShapeN) — fused
into a single kernel over the tile-binned layout of ops/tiling.py.

TPU-native formulation: per-particle B-spline weights become dense band
matrices over the tile window (W grid points per dim).  Because the centered
B-spline S_n has compact support, the band matrix A[i, p] = S_n(x_p - i)
is exactly the scatter-free placement of each particle's weights — no one-hot
comparisons, no scatter/gather primitives, out-of-window particles simply see
their support clipped (and are counted in the per-tile violation output).

Particles ride WIDE-LANE (1, p_max) planes: the particle axis is the lane
axis of every per-particle array (bands are (W, p_max), transverse outer
products (W*W, p_max)), so each contraction is ONE streaming matmul over all
of a tile's particles instead of p_max//128 batched small-M instances —
Mosaic lowers lane-batched dots far better than sublane-batched ones (the
(S, ., 128) ancestor of this layout measured ~2x slower at the same op
count, tools/kernel_lab.py).  Slot capacity granularity stays 128 lanes;
slot occupancy directly multiplies every VPU/MXU op in the kernel, so
fine-grained p_max remains a first-order performance knob.  The 7 particle
inputs and 6 outputs ride ONE packed block each ((1, 7|6, 1, P)): separate
refs cost ~0.4 ns/slot of per-grid-step DMA setup at this block size.

MXU shapes (K or N = W*W = 256+, the other free side = p_max):

  * gather contracts the window over the fused (y,z) axis with the particle
    lanes streaming:
      h[i_x, p] = sum_{jk} Ewin[i_x, jk] * (Ay ⊙ Az)[jk, p]   (K = W^2)
    followed by a cheap VPU reduction  e[p] = sum_i Ax[i, p] h[i, p];
  * deposition contracts over the particle lanes:
      J[i_d, jk] = sum_p (Wd ⊙ wq)[i_d, p] * Tab[jk, p]       (K = p_max)
    replacing atomicAdd scatter (the design analog of the reference's
    shared-memory binned deposition, WarpXParticleContainer.cpp:490-548).

The Esirkepov transverse mix uses the 2-outer-product identity
  1/3 (AB + CD) + 1/6 (AD + CB) = 1/4 (A+C)(B+D) + 1/12 (A-C)(B-D)
(cf. CurrentDeposition.H:820 one_third/one_sixth combination; with
s = Sn + So and d = Sn - So the sum Sn Sn + So So = (s s + d d)/2, so the
three-outer form 1/6 [s s + Sn Sn + So So] collapses to two outers —
the d factors are the per-axis difference rows the cumulative sums already
need, so the mix costs two VPU outer products per current component).

Multiple species ride ONE pallas launch: the grid is (xy-column, z-tile,
n_species) with the species index innermost, so Mosaic fetches each field
window once and accumulates the J windows of all species in VMEM before a
single writeback (the per-species q/m/external-field rows live in SMEM).

Field windows are fetched INSIDE the kernel by double-buffered async DMA from
the guard-padded field arrays in HBM (the window for tile t+1 is in flight
while tile t computes), eliminating the host-side extract_windows pass and
its 8x-inflated HBM window intermediate entirely: the only field traffic per
step is the overlapping (W, W, W) boxes themselves.

MXU precision (``mxu``): the TPU MXU natively multiplies bf16 operands;
"f32" matmuls are emulated by 3 bf16 passes (precision=HIGHEST), and the
DEFAULT precision is a single bf16 pass — i.e. silently ~3e-3 operand
rounding.  The modes are therefore:
  * 'f32'   — all contractions at HIGHEST (true f32; ~6 MXU passes each);
  * 'mixed' — gather operands rounded to bfloat16 (one pass: the ~0.4% field
    interpolation rounding is far below macro-particle sampling noise) while
    the Esirkepov deposit runs a manual bf16_3x split (hi/lo decomposition,
    three single-pass dots, dropping only the lo*lo term): deposit relative
    error ~2^-16 — ~400x tighter than bf16 and ~2.3x faster than HIGHEST on
    these shapes (tools/bench_deposit_prec.py);
  * 'bf16'  — deposit operands rounded to one bf16 pass too (max speed,
    relaxes charge conservation to ~1e-3 per step).
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

__all__ = ["binned_push_deposit", "pad_fields"]

_GALERKIN_AXES = {
    "Ex": ("x",),
    "Ey": ("y",),
    "Ez": ("z",),
    "Bx": ("y", "z"),
    "By": ("x", "z"),
    "Bz": ("x", "y"),
}

_AXES = ("x", "y", "z")

_HI = jax.lax.Precision.HIGHEST


def _dot3x(lhs, rhs, dims, f):
    """Manual bf16_3x dot: hi/lo bf16 split of both operands, dropping only
    the lo*lo cross term (~2^-16 relative) — three single-pass MXU dots,
    ~2.3x faster than precision=HIGHEST at the deposit shapes
    (tools/bench_deposit_prec.py; Mosaic has no 3-pass HIGH mode)."""
    lh = lhs.astype(jnp.bfloat16)
    ll = (lhs - lh.astype(f)).astype(jnp.bfloat16)
    rh = rhs.astype(jnp.bfloat16)
    rl = (rhs - rh.astype(f)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=f)
    return (jax.lax.dot_general(lh, rh, dims, **kw)
            + jax.lax.dot_general(lh, rl, dims, **kw)
            + jax.lax.dot_general(ll, rh, dims, **kw))


def _build_kernel(spec, geom, staggering, order, galerkin, pusher_name, dt,
                  dtype, mxu, nzp, smax=0):
    W, P, T = spec.w, spec.p_max, order + 3
    S = P // 128
    ntx, nty, ntz = spec.tiles_per_dim
    tdims = spec.tile
    dx = geom.dx
    inv_dx = tuple(1.0 / d for d in dx)
    invdtd = (
        1.0 / (dt * dx[1] * dx[2]),
        1.0 / (dt * dx[0] * dx[2]),
        1.0 / (dt * dx[0] * dx[1]),
    )
    pusher = PUSHERS[pusher_name]
    inv_c2 = 1.0 / (_c * _c)
    f = dtype
    # gather / deposit MXU operand dtype and pass count (module docstring)
    gmx = jnp.bfloat16 if mxu in ("mixed", "bf16") else f
    dmx = jnp.bfloat16 if mxu == "bf16" else f
    gprec = None if mxu in ("mixed", "bf16") else _HI
    dprec = None if mxu == "bf16" else _HI

    def kernel(params, anch, shft, occnt, fex, fey, fez, fbx, fby, fbz,
               pin, pout, jxw, jyw, jzw, violr,
               slab, win2, sems):
        sid = pl.program_id(2)
        q = params[sid, 0]
        m = params[sid, 1]
        txy = pl.program_id(0)
        t2 = pl.program_id(1)
        n_txy = pl.num_programs(0)
        t0 = txy // nty
        t1 = txy - t0 * nty
        worig = (t0 * tdims[0] - spec.off,
                 t1 * tdims[1] - spec.off,
                 t2 * tdims[2] - spec.off)

        # ---- double-buffered in-kernel slab DMA ---------------------------
        # The padded fields live in HBM; the (x,y)-tile-column txy needs the
        # (W, W, nzp) slab starting at (t0*tx, t1*ty, 0) in padded coords
        # (Mosaic DMA cannot slice the lane dim at unaligned offsets, so the
        # z axis rides whole; each z-tile then selects its W-lane window from
        # VMEM).  Slot txy%2 holds column txy; column txy+1's DMA is issued
        # before column txy computes, hiding its latency behind ntz*ns steps.
        frefs = (fex, fey, fez, fbx, fby, fbz)

        def _dmas(slot, col):
            tt0 = col // nty
            tt1 = col - tt0 * nty
            x0 = pl.multiple_of(tt0 * tdims[0], tdims[0])
            y0 = pl.multiple_of(tt1 * tdims[1], tdims[1])
            return [
                pltpu.make_async_copy(
                    fr.at[pl.ds(x0, W), pl.ds(y0, W), :],
                    slab.at[slot, ci],
                    sems.at[slot, ci],
                )
                for ci, fr in enumerate(frefs)
            ]

        @pl.when((sid == 0) & (t2 == 0))
        def _fetch():
            @pl.when(txy == 0)
            def _():
                for dma in _dmas(0, 0):
                    dma.start()

            @pl.when(txy + 1 < n_txy)
            def _():
                for dma in _dmas((txy + 1) % 2, txy + 1):
                    dma.start()

            for dma in _dmas(txy % 2, txy):
                dma.wait()

        @pl.when(sid == 0)
        def _window():
            # (W, W, nzp) slab -> (W, W*W) fused-lane window for this z-tile
            # (reused by every species step of this tile).  Mosaic can't
            # vector-load at dynamic lane offsets, so rotate the lane axis by
            # the tile's z origin and take the leading W lanes statically.
            # Moving-window (bounded) mode: tiles are anchored in space at
            # the last rebin while the grid has moved ``shft`` cells along z
            # since, so the window slides back by shft within the smax-slack
            # padded slab (z0 stays >= 0 because shft <= smax).
            slot_ = txy % 2
            z0 = t2 * tdims[2] + (smax - shft[0, 0])
            for ci in range(6):
                # Mosaic's dynamic rotate is 32-bit only; roll the f32 slab
                # and round to the gather dtype while slicing into win2
                rot = pltpu.roll(slab[slot_, ci], -z0, 2)
                for b in range(W):
                    win2[ci, :, b * W:(b + 1) * W] = rot[:, b, :W].astype(gmx)
        # ---- tile-occupancy skip: a (species, tile) with zero alive
        # particles (the vacuum ahead of a moving window, a localized
        # beam species) pays only a plane copy instead of the full
        # gather/push/deposit arithmetic (~17x, tools/kernel_lab.py)
        occ = occnt[0, 0, 0] > 0

        @pl.when(jnp.logical_not(occ))
        def _skip():
            for ci in range(6):
                pout[0, ci] = pin[0, ci]
            violr[0] = jnp.zeros((8, 128), jnp.int32)

            @pl.when(sid == 0)
            def _zero_j():
                jxw[0] = jnp.zeros((W, W * W), f)
                jyw[0] = jnp.zeros((W, W * W), f)
                jzw[0] = jnp.zeros((W, W * W), f)

        @pl.when(occ)
        def _compute():
            # particle blocks are packed (1, 7|6, 1, P) wide-lane planes; all
            # per-particle math below is on (1, P) vectors (bands (W, P),
            # outers (W*W, P))
            pos = (pin[0, 0], pin[0, 1], pin[0, 2])
            X = [
                (pos[d] - anch[0, d]) * inv_dx[d] - worig[d].astype(f)
                for d in range(3)
            ]
            rows = jax.lax.broadcasted_iota(jnp.int32, (W, P), 0).astype(f)

            def band(xc, o_eff):
                """(W, P) band matrix A[i, p] = S_o(xc_p - i): each particle's
                shape weights land on its o+1 support rows, zero elsewhere.

                Order 0 uses the half-open box [-1/2, 1/2) so a particle exactly
                at a half-integer position lands on one row, matching the
                reference's floor(x + 0.5) index selection (ShapeFactors.H:40)."""
                xi = xc - rows
                if o_eff == 0:
                    return jnp.where(
                        (xi >= -0.5) & (xi < 0.5),
                        jnp.ones((), f), jnp.zeros((), f),
                    )
                return spline(xi, o_eff)

            # ---- gather ------------------------------------------------------
            acache = {}

            def axis_mat(d, o_eff, stag):
                key_ = (d, o_eff, stag)
                if key_ not in acache:
                    acache[key_] = band(X[d] - (0.5 if stag else 0.0), o_eff)
                return acache[key_]

            bcache = {}

            def yz_mat(ykey, zkey):
                key_ = (ykey, zkey)
                if key_ not in bcache:
                    ay = axis_mat(1, *ykey)
                    az = axis_mat(2, *zkey)
                    bcache[key_] = (
                        ay[:, None, :] * az[None, :, :]
                    ).reshape(W * W, P).astype(gmx)
                return bcache[key_]

            # components sharing a transverse band product ride ONE contraction
            # with their windows stacked on the M axis (Yee+galerkin: 6
            # components -> 4 dots of M in {W, 2W})
            comp_groups: dict = {}
            for ci, comp in enumerate(("Ex", "Ey", "Ez", "Bx", "By", "Bz")):
                flags = staggering[comp]
                keys = []
                for d in range(3):
                    reduced = galerkin and (_AXES[d] in _GALERKIN_AXES[comp])
                    o_eff = order - 1 if reduced else order
                    keys.append((o_eff, flags[d] == 0))
                comp_groups.setdefault((keys[1], keys[2]), []).append(
                    (ci, keys[0])
                )
            e6 = [None] * 6
            for (ykey, zkey), members in comp_groups.items():
                byz = yz_mat(ykey, zkey)
                wstk = (
                    win2[members[0][0]] if len(members) == 1
                    else jnp.concatenate([win2[ci] for ci, _ in members], axis=0)
                )
                # h[(c,i), p] = Ewin ((c,i),(jk)) . Byz ((jk), p): K = W^2,
                # particle lanes stream on N
                h = jax.lax.dot_general(
                    wstk, byz, (((1,), (0,)), ((), ())),
                    preferred_element_type=f, precision=gprec,
                )
                for g, (ci, xkey) in enumerate(members):
                    ax_m = axis_mat(0, *xkey)
                    e6[ci] = jnp.sum(
                        ax_m * h[g * W:(g + 1) * W], axis=0, keepdims=True
                    )
            ex, ey, ez, bx, by, bz = e6
            ex = ex + params[sid, 2]
            ey = ey + params[sid, 3]
            ez = ez + params[sid, 4]
            bx = bx + params[sid, 5]
            by = by + params[sid, 6]
            bz = bz + params[sid, 7]

            # ---- push ----------------------------------------------------------
            ux, uy, uz = pusher(
                pin[0, 3], pin[0, 4], pin[0, 5],
                ex, ey, ez, bx, by, bz, q, m, dt,
            )
            gaminv = 1.0 / jnp.sqrt(1.0 + (ux * ux + uy * uy + uz * uz) * inv_c2)
            vel = (ux * gaminv, uy * gaminv, uz * gaminv)
            pout[0, 0] = pos[0] + vel[0] * dt
            pout[0, 1] = pos[1] + vel[1] * dt
            pout[0, 2] = pos[2] + vel[2] * dt
            pout[0, 3] = ux
            pout[0, 4] = uy
            pout[0, 5] = uz

            # ---- Esirkepov deposit ---------------------------------------------
            # new position in window units; old = new - v*dt/dx (== X exactly)
            wq = q * pin[0, 6]
            sm, df, cs, bad = [], [], [], None
            for d in range(3):
                xn = X[d] + vel[d] * (dt * inv_dx[d])
                nn = band(xn, order)
                # the old-position order-``order`` unstaggered band is usually
                # already in the gather cache
                no = axis_mat(d, order, False)
                sm.append(nn + no)
                diff = no - nn
                df.append(diff)
                # cumulative Esirkepov difference sums: prefix over window rows
                # (rows outside the support accumulate to exactly 0); log-step
                # shifted adds — Mosaic has no cumsum primitive
                acc = diff
                s = 1
                while s < W:
                    acc = acc + jnp.pad(acc[:-s], ((s, 0), (0, 0)))
                    s *= 2
                cs.append(acc)
                i0 = start_index(xn, order) - 1
                bd = (i0 < 0) | (i0 > W - T)
                bad = bd if bad is None else (bad | bd)

            def outer(a, b):
                return (a[:, None, :] * b[None, :, :]).reshape(W * W, P)

            for d, (a, b, out_ref) in enumerate(
                ((1, 2, jxw), (0, 2, jyw), (0, 1, jzw))
            ):
                # two-outer mix: 1/4 s_a s_b + 1/12 d_a d_b (module docstring);
                # ONE streaming contraction over the particle lanes (K = P)
                lhs = cs[d] * (wq * invdtd[d])
                dims = (((1,), (1,)), ((), ()))
                if dprec is not None:
                    # multi-pass modes: the scalars commute into the rhs, so the
                    # two outer-product contractions collapse to ONE dot against
                    # their scaled sum — a (W*W, P) VPU add replaces a whole
                    # MXU pass group
                    rhs = (0.25 * outer(sm[a], sm[b])
                           + (1.0 / 12.0) * outer(df[a], df[b]))
                    if mxu == "mixed":
                        jd = _dot3x(lhs, rhs, dims, f)
                    else:
                        jd = jax.lax.dot_general(
                            lhs, rhs, dims,
                            preferred_element_type=f, precision=dprec,
                        )
                else:
                    # bf16: single MXU passes are cheaper than an f32 combine —
                    # keep two dots on pre-cast operands
                    jd = jax.lax.dot_general(
                        (0.25 * lhs).astype(dmx),
                        outer(sm[a], sm[b]).astype(dmx), dims,
                        preferred_element_type=f,
                    ) + jax.lax.dot_general(
                        ((1.0 / 12.0) * lhs).astype(dmx),
                        outer(df[a], df[b]).astype(dmx), dims,
                        preferred_element_type=f,
                    )
                # species accumulate into the same VMEM window (grid dim 2)
                @pl.when(sid == 0)
                def _init(jd=jd, out_ref=out_ref):
                    out_ref[0] = jd

                @pl.when(sid > 0)
                def _acc(jd=jd, out_ref=out_ref):
                    out_ref[0] = out_ref[0] + jd

            alive = pin[0, 6] > 0
            cnt = jnp.sum((bad & alive).astype(jnp.int32))
            violr[0] = jnp.broadcast_to(cnt, (8, 128))


    return kernel


def _build_kernel_2d(spec, geom, staggering, order, galerkin, pusher_name,
                     dt, dtype, mxu, nzp, smax=0):
    """2D XZ variant of the fused kernel.

    Same structure as the 3D kernel with the transverse product collapsed to
    the z band alone; the Esirkepov forms are the reference's 2D branch
    (CurrentDeposition.H doEsirkepovDepositionShapeN, 2D: J_x/J_z cumulative
    with the half-sum transverse weight, out-of-plane J_y direct with the
    1/3-1/6 mix — validated jnp version: ops/deposit.py _esirkepov_body
    ndim==2).  All three J components plus the J_y mix ride ONE batched MXU
    contraction with segments stacked on the batch axis (the post-dot
    segment sum realizes both the S-plane reduction and the J_y two-term
    mix).
    """
    W, P, T = spec.w, spec.p_max, order + 3
    S = P // 128
    ntx, ntz = spec.tiles_per_dim
    tdims = spec.tile
    dx = geom.dx  # (dx, dz)
    inv_dx = (1.0 / dx[0], 1.0 / dx[1])
    invvol = 1.0 / (dx[0] * dx[1])
    invdtd = (1.0 / (dt * dx[1]), 1.0 / (dt * dx[0]))  # (J_x, J_z)
    pusher = PUSHERS[pusher_name]
    inv_c2 = 1.0 / (_c * _c)
    f = dtype
    gmx = jnp.bfloat16 if mxu in ("mixed", "bf16") else f
    dmx = jnp.bfloat16 if mxu == "bf16" else f
    gprec = None if mxu in ("mixed", "bf16") else _HI
    dprec = None if mxu == "bf16" else _HI
    axnames = ("x", "z")

    def kernel(params, anch, shft, occnt, fex, fey, fez, fbx, fby, fbz,
               pin, pout, jxw, jyw, jzw, violr,
               slab, win2, sems):
        sid = pl.program_id(2)
        q = params[sid, 0]
        m = params[sid, 1]
        tx = pl.program_id(0)
        t2 = pl.program_id(1)
        n_tx = pl.num_programs(0)
        worig = (tx * tdims[0] - spec.off, t2 * tdims[1] - spec.off)
        frefs = (fex, fey, fez, fbx, fby, fbz)

        def _dmas(slot, col):
            x0 = pl.multiple_of(col * tdims[0], tdims[0])
            return [
                pltpu.make_async_copy(
                    fr.at[pl.ds(x0, W), :],
                    slab.at[slot, ci],
                    sems.at[slot, ci],
                )
                for ci, fr in enumerate(frefs)
            ]

        @pl.when((sid == 0) & (t2 == 0))
        def _fetch():
            @pl.when(tx == 0)
            def _():
                for dma in _dmas(0, 0):
                    dma.start()

            @pl.when(tx + 1 < n_tx)
            def _():
                for dma in _dmas((tx + 1) % 2, tx + 1):
                    dma.start()

            for dma in _dmas(tx % 2, tx):
                dma.wait()

        @pl.when(sid == 0)
        def _window():
            slot_ = tx % 2
            z0 = t2 * tdims[1] + (smax - shft[0, 0])
            for ci in range(6):
                rot = pltpu.roll(slab[slot_, ci], -z0, 1)
                win2[ci] = rot[:, :W].astype(gmx)

        # ---- tile-occupancy skip (see the 3D kernel) ------------------
        occ = occnt[0, 0, 0] > 0

        @pl.when(jnp.logical_not(occ))
        def _skip():
            for ci in range(5):
                pout[0, ci] = pin[0, ci]
            violr[0] = jnp.zeros((8, 128), jnp.int32)

            @pl.when(sid == 0)
            def _zero_j():
                jxw[0] = jnp.zeros((W, W), f)
                jyw[0] = jnp.zeros((W, W), f)
                jzw[0] = jnp.zeros((W, W), f)

        @pl.when(occ)
        def _compute():
            pos_act = (pin[0, 0], pin[0, 1])
            X = [
                (pos_act[d] - anch[0, d]) * inv_dx[d] - worig[d].astype(f)
                for d in range(2)
            ]
            rows = jax.lax.broadcasted_iota(jnp.int32, (W, P), 0).astype(f)

            def band(xc, o_eff):
                xi = xc - rows
                if o_eff == 0:
                    return jnp.where(
                        (xi >= -0.5) & (xi < 0.5),
                        jnp.ones((), f), jnp.zeros((), f),
                    )
                return spline(xi, o_eff)

            # ---- gather ------------------------------------------------------
            acache = {}

            def axis_mat(d, o_eff, stag):
                key_ = (d, o_eff, stag)
                if key_ not in acache:
                    acache[key_] = band(X[d] - (0.5 if stag else 0.0), o_eff)
                return acache[key_]

            zcache = {}

            def z_mat(zkey):
                if zkey not in zcache:
                    zcache[zkey] = axis_mat(1, *zkey).astype(gmx)
                return zcache[zkey]

            comp_groups: dict = {}
            for ci, comp in enumerate(("Ex", "Ey", "Ez", "Bx", "By", "Bz")):
                flags = staggering[comp]
                keys = []
                for d in range(2):
                    reduced = galerkin and (
                        axnames[d] in _GALERKIN_AXES[comp]
                    )
                    o_eff = order - 1 if reduced else order
                    keys.append((o_eff, flags[d] == 0))
                comp_groups.setdefault(keys[1], []).append((ci, keys[0]))
            e6 = [None] * 6
            for zkey, members in comp_groups.items():
                az = z_mat(zkey)
                wstk = (
                    win2[members[0][0]] if len(members) == 1
                    else jnp.concatenate([win2[ci] for ci, _ in members], axis=0)
                )
                # h[(c,i), p] = Win ((c,i),j) . Az (j, p): K = W
                h = jax.lax.dot_general(
                    wstk, az, (((1,), (0,)), ((), ())),
                    preferred_element_type=f, precision=gprec,
                )
                for g, (ci, xkey) in enumerate(members):
                    ax_m = axis_mat(0, *xkey)
                    e6[ci] = jnp.sum(
                        ax_m * h[g * W:(g + 1) * W], axis=0, keepdims=True
                    )
            ex, ey, ez, bx, by, bz = e6
            ex = ex + params[sid, 2]
            ey = ey + params[sid, 3]
            ez = ez + params[sid, 4]
            bx = bx + params[sid, 5]
            by = by + params[sid, 6]
            bz = bz + params[sid, 7]

            # ---- push ----------------------------------------------------------
            ux, uy, uz = pusher(
                pin[0, 2], pin[0, 3], pin[0, 4],
                ex, ey, ez, bx, by, bz, q, m, dt,
            )
            gaminv = 1.0 / jnp.sqrt(1.0 + (ux * ux + uy * uy + uz * uz) * inv_c2)
            vel = (ux * gaminv, uy * gaminv, uz * gaminv)
            pout[0, 0] = pos_act[0] + vel[0] * dt
            pout[0, 1] = pos_act[1] + vel[2] * dt
            pout[0, 2] = ux
            pout[0, 3] = uy
            pout[0, 4] = uz

            # ---- Esirkepov deposit ---------------------------------------------
            wq = q * pin[0, 5]
            vel_act = (vel[0], vel[2])
            sm, df, cs, bad = [], [], [], None
            for d in range(2):
                xn = X[d] + vel_act[d] * (dt * inv_dx[d])
                nn = band(xn, order)
                no = axis_mat(d, order, False)
                sm.append(nn + no)
                diff = no - nn
                df.append(diff)
                acc = diff
                s = 1
                while s < W:
                    acc = acc + jnp.pad(acc[:-s], ((s, 0), (0, 0)))
                    s *= 2
                cs.append(acc)
                i0 = start_index(xn, order) - 1
                bd = (i0 < 0) | (i0 > W - T)
                bad = bd if bad is None else (bad | bd)

            # segment stack: (J_x, J_z, J_y-sum-term, J_y-diff-term); each is an
            # (lhs_x-side, rhs_z-side) pair contracted over the particle lanes
            wqvy = wq * (vel[1] * invvol)
            lhs4 = jnp.stack([
                cs[0] * (wq * invdtd[0]),
                0.5 * sm[0],
                (0.25 * wqvy) * sm[0],
                ((1.0 / 12.0) * wqvy) * df[0],
            ], axis=0).astype(dmx)
            rhs4 = jnp.stack([
                0.5 * sm[1],
                cs[1] * (wq * invdtd[1]),
                sm[1],
                df[1],
            ], axis=0).astype(dmx)
            dims4 = (((2,), (2,)), ((0,), (0,)))
            if mxu == "mixed":
                jd4 = _dot3x(lhs4.astype(f), rhs4.astype(f), dims4, f)
            else:
                jd4 = jax.lax.dot_general(
                    lhs4, rhs4, dims4,
                    preferred_element_type=f, precision=dprec,
                )
            for jd, out_ref in (
                (jd4[0], jxw), (jd4[2] + jd4[3], jyw), (jd4[1], jzw)
            ):
                @pl.when(sid == 0)
                def _init(jd=jd, out_ref=out_ref):
                    out_ref[0] = jd

                @pl.when(sid > 0)
                def _acc(jd=jd, out_ref=out_ref):
                    out_ref[0] = out_ref[0] + jd

            alive = pin[0, 5] > 0
            cnt = jnp.sum((bad & alive).astype(jnp.int32))
            violr[0] = jnp.broadcast_to(cnt, (8, 128))


    return kernel


def pad_fields(fields6, spec, mxu="f32"):
    """Guard-pad the six field arrays for the in-kernel window DMA.

    Periodic wrap by ``off`` below / ``W - tile - off`` above per axis so the
    window for tile t starts at t*tile in padded coordinates (the FillBoundary
    analog, now just a wrap-pad).
    """
    ndim = spec.ndim
    pw = tuple(
        (spec.off, spec.w - spec.tile[d] - spec.off) for d in range(ndim)
    )
    del mxu  # slab stays f32: Mosaic's dynamic lane rotate is 32-bit only;
    # the kernel rounds to bf16 while building the (W, W*W) window
    # the z (lane) axis is zero-padded up to a multiple of 128 so the
    # kernel's dynamic lane rotation has an aligned shape; the zero lanes
    # are never read back (rotations only expose [z0, z0+W))
    lanes = 128
    nzp = fields6[0].shape[ndim - 1] + pw[ndim - 1][0] + pw[ndim - 1][1]
    zextra = (-nzp) % lanes
    out = []
    for a in fields6:
        a = jnp.pad(a, pw, mode="wrap")
        if zextra:
            a = jnp.pad(
                a, ((0, 0),) * (ndim - 1) + ((0, zextra),)
            )
        out.append(a)
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "geom", "order", "galerkin", "pusher_name", "dt",
        "stag_items", "mxu", "smax", "interpret",
    ),
)
def binned_push_deposit(
    params,
    fields6,
    parts7,
    anchors=None,
    zshift=None,
    counts=None,
    *,
    spec,
    geom,
    order,
    galerkin,
    pusher_name,
    dt,
    stag_items,
    mxu="f32",
    smax=0,
    interpret=False,
):
    """Run the fused kernel over all tiles for ALL species at once.

    params: (n_sp, 8) [q, m, Eext(3), Bext(3)] per species; fields6:
    6 guard-padded (nx+W-tx, ny+W-ty, nz+W-tz) field arrays from
    ``pad_fields`` (windows are DMA'd from them inside the kernel);
    parts7: (x, y, z, ux, uy, uz, w) each (n_sp * n_tiles, p_max) — the
    per-species tile arrays stacked along the tile axis.

    Returns (new_parts6 (x,y,z,ux,uy,uz) each (n_sp*n_tiles, p_max),
    (jx_w, jy_w, jz_w) summed over species, violations (n_sp*n_tiles,)):
    J windows are (n_tiles, W, W*W) with per-component layouts
    (x,(y,z)), (y,(x,z)), (z,(x,y)) — pass fold_windows axes=(0,1,2)/(1,0,2)/
    (2,0,1) respectively.  ``violations`` counts alive particles that
    drifted beyond the rebin margin (must be all zero).
    """
    staggering = dict(stag_items)
    dtype = parts7[0].dtype
    W, P, nt = spec.w, spec.p_max, spec.n_tiles
    ndim = spec.ndim
    ns = parts7[0].shape[0] // nt
    nzp = fields6[0].shape[ndim - 1]
    build = _build_kernel if ndim == 3 else _build_kernel_2d
    kernel = build(
        spec, geom, staggering, order, galerkin, pusher_name, dt, dtype,
        mxu, nzp, smax=smax,
    )
    # dynamic tiling origin (anchor) + accumulated moving-window cell shift;
    # the periodic path anchors at prob_lo with zero shift
    if anchors is None:
        anchors = jnp.asarray(geom.prob_lo, dtype)
    anchors = jnp.asarray(anchors, dtype).reshape(1, ndim)
    if zshift is None:
        zshift = jnp.zeros((), jnp.int32)
    zshift = jnp.asarray(zshift, jnp.int32).reshape(1, 1)
    # per-(species, tile) alive counts gate the whole compute body: tiles
    # in vacuum (or species localized elsewhere) cost a plane copy only.
    # Mosaic only accepts whole-array SMEM blocks, so the counts ride VMEM
    # as (n, 1, 128) lane-broadcast rows sliced one row per grid step.
    if counts is None:
        counts = jnp.ones((parts7[0].shape[0],), jnp.int32)
    counts = jnp.broadcast_to(
        jnp.asarray(counts, jnp.int32)[:, None, None],
        (parts7[0].shape[0], 1, 128),
    )
    if P % 128:
        raise ValueError("p_max must be a multiple of 128")
    gmx = jnp.bfloat16 if mxu in ("mixed", "bf16") else fields6[0].dtype
    ntz = spec.tiles_per_dim[-1]
    wlast = W * W if ndim == 3 else W
    win_spec = pl.BlockSpec(
        (1, W, wlast), lambda i, k, s: (i * ntz + k, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # fields must stay in HBM: the in-kernel slab DMA slices them at
    # tile-aligned (not lane-aligned) offsets, which VMEM tiling forbids
    field_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    # particle I/O arity: 2D drops the inactive y coordinate
    n_pin = 7 if ndim == 3 else 6
    n_pout = n_pin - 1
    if len(parts7) != n_pin:
        raise ValueError(f"expected {n_pin} particle arrays, got {len(parts7)}")
    # ONE packed wide-lane block per direction (module docstring)
    pin_spec = pl.BlockSpec(
        (1, n_pin, 1, P), lambda i, k, s: (s * nt + i * ntz + k, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pout_spec = pl.BlockSpec(
        (1, n_pout, 1, P), lambda i, k, s: (s * nt + i * ntz + k, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    parts_packed = jnp.stack(
        [a.reshape(ns * nt, 1, P) for a in parts7], axis=1
    )
    # slab DMA unit: 3D fetches (W, W, nzp) per (x,y)-tile-column, 2D
    # fetches (W, nzp) per x-tile-column
    slab_dims = (W, W, nzp) if ndim == 3 else (W, nzp)
    n_cols = nt // ntz
    grid_spec = pl.GridSpec(
        # transverse-column outer, z-tile middle, species innermost: each
        # field slab is DMA'd once per column and the J windows accumulate
        # in VMEM across species before writeback
        grid=(n_cols, ntz, ns),
        in_specs=[
            pl.BlockSpec(
                (ns, 8), lambda i, k, s: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, ndim), lambda i, k, s: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda i, k, s: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 128), lambda i, k, s: (s * nt + i * ntz + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [field_spec] * 6
        + [pin_spec],
        out_specs=[pout_spec]
        + [win_spec] * 3
        + [
            pl.BlockSpec(
                (1, 8, 128), lambda i, k, s: (s * nt + i * ntz + k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 6) + slab_dims, fields6[0].dtype),
            pltpu.VMEM((6, W, wlast), gmx),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    out_shape = (
        [jax.ShapeDtypeStruct((ns * nt, n_pout, 1, P), dtype)]
        + [jax.ShapeDtypeStruct((nt, W, wlast), dtype)] * 3
        + [jax.ShapeDtypeStruct((ns * nt, 8, 128), jnp.int32)]
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(params, anchors, zshift, counts, *fields6, parts_packed)
    return (
        tuple(outs[0][:, i, 0] for i in range(n_pout)),
        tuple(outs[1:4]),
        outs[4][:, 0, 0],
    )
