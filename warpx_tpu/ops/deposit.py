"""Charge and current deposition (particles -> grid), vectorized scatter-add.

Esirkepov charge-conserving current deposition reimplements
doEsirkepovDepositionShapeN (reference: Source/Particles/Deposition/
CurrentDeposition.H:643-900) on the periodic torus: the per-particle
(order+3)-point window weights become tap arrays, the in-direction running sum
becomes a cumsum, and the atomicAdd becomes an XLA scatter-add with modular
indices (the SumBoundary guard-cell fold is implicit in the wrap).

Direct (non-charge-conserving) deposition follows doDepositionShapeN
(CurrentDeposition.H:274) — J at the staggered Yee sites from the
time-midpoint position.  Charge deposition follows doChargeDepositionShapeN
(Source/Particles/Deposition/ChargeDeposition.H) — nodal rho.

Deposition dtype is kept in f64 spirit by the caller's global precision; the
reference similarly forces double for shifted shape factors
(CurrentDeposition.H:720 "Keep these double").
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax.numpy as jnp

from ..constants import c as _c
from .shapes import esirkepov_weights, shape_weights

__all__ = [
    "deposit_rho",
    "deposit_current_esirkepov",
    "deposit_current_direct",
    "count_particles_per_cell",
]

_inv_c2 = 1.0 / (_c * _c)


def _scatter_add(target: jnp.ndarray, idx_per_dim, values: jnp.ndarray):
    """target.at[ravel(idx)].add(values) with C-order linearization."""
    n = target.shape
    lin = idx_per_dim[0]
    for d in range(1, len(n)):
        lin = lin * n[d] + idx_per_dim[d]
    flat = target.reshape(-1).at[lin.reshape(-1)].add(values.reshape(-1))
    return flat.reshape(n)


def _gaminv(ux, uy, uz):
    return 1.0 / jnp.sqrt(
        1.0 + (ux * ux + uy * uy + uz * uz) * _inv_c2
    )


def _tap_idx(i0, T, n, wrap, offset):
    # tap axis FIRST: (T, np) — keeps the large particle axis last so TPU
    # (8,128) tiling does not pad small tap dims (32x memory blowup otherwise)
    idx = i0[None, :] + jnp.arange(T)[:, None] + offset
    return jnp.mod(idx, n) if wrap else idx


def deposit_rho(
    positions: Sequence[jnp.ndarray],
    w: jnp.ndarray,
    q: float,
    geom,
    order: int,
    out: jnp.ndarray | None = None,
    origin=None,
    wrap: bool = True,
    offset: int = 0,
    out_shape=None,
) -> jnp.ndarray:
    """Deposit nodal charge density rho [C/m^3] (ChargeDeposition.H shape-N)."""
    ndim = geom.ndim
    n_cell = geom.n_cell
    shape = out_shape or n_cell
    invvol = 1.0 / geom.cell_volume
    lo = origin if origin is not None else geom.prob_lo
    coords = [
        (positions[d] - lo[d]) / geom.dx[d] for d in range(ndim)
    ]
    starts, weights = [], []
    for d in range(ndim):
        i0, ws = shape_weights(coords[d], order)
        starts.append(i0)
        weights.append(ws)
    wq = q * w * invvol
    rho = jnp.zeros(shape, dtype=w.dtype) if out is None else out
    vals, idxs = [], []
    for taps in itertools.product(*[range(order + 1)] * ndim):
        val = wq
        for d in range(ndim):
            val = val * weights[d][taps[d]]
        vals.append(val)
        if wrap:
            idxs.append(
                [jnp.mod(starts[d] + taps[d] + offset, n_cell[d]) for d in range(ndim)]
            )
        else:
            idxs.append([starts[d] + taps[d] + offset for d in range(ndim)])
    values = jnp.stack(vals, axis=0)  # (ntaps, np): particle axis last
    idx_per_dim = [
        jnp.stack([ix[d] for ix in idxs], axis=0) for d in range(ndim)
    ]
    return _scatter_add(rho, idx_per_dim, values)


def count_particles_per_cell(positions, alive, geom, origin=None) -> jnp.ndarray:
    """Particle count per cell (diag 'part_per_cell')."""
    ndim = geom.ndim
    lo = origin if origin is not None else geom.prob_lo
    idx = [
        jnp.clip(
            jnp.floor(
                (positions[d] - lo[d]) / geom.dx[d]
            ).astype(jnp.int32),
            0,
            geom.n_cell[d] - 1,
        )
        for d in range(ndim)
    ]
    target = jnp.zeros(geom.n_cell, dtype=positions[0].dtype)
    return _scatter_add(target, idx, alive.astype(target.dtype))


def _tap_arrays(x_new, x_old, order):
    """Stacked Esirkepov tap weights: (i0, SN, SO) with SN/SO of shape (T, np)."""
    i0, s_new, s_old = esirkepov_weights(x_new, x_old, order)
    return i0, jnp.stack(s_new, axis=0), jnp.stack(s_old, axis=0)


def deposit_current_esirkepov(
    positions: Sequence[jnp.ndarray],
    ux, uy, uz, w,
    q: float,
    geom,
    dt: float,
    order: int,
    relative_time: float | None = None,
    origin=None,
    wrap: bool = True,
    offset: int = 0,
    out_shape=None,
    chunk_size: int | None = None,
    positions_old=None,
    gaminv_override=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Charge-conserving current deposition (chunked driver).

    chunk_size bounds the (np, (order+3)^ndim) tap intermediates: large
    particle counts are deposited in fixed-size chunks accumulated with a
    fori_loop, keeping peak memory flat without changing results (scatter-add
    is associative per-chunk; same dtype accumulation).
    """
    n = w.shape[0]
    if chunk_size is None or n <= chunk_size:
        return _esirkepov_body(
            positions, ux, uy, uz, w, q, geom, dt, order,
            relative_time, origin, wrap, offset, out_shape,
            positions_old, gaminv_override,
        )
    if positions_old is not None or gaminv_override is not None:
        raise NotImplementedError(
            "chunked implicit deposition not needed yet"
        )
    import jax
    from jax import lax

    nchunks = -(-n // chunk_size)
    pad = nchunks * chunk_size - n

    def padded(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    pos_p = [padded(p, 0.5 * (geom.prob_lo[d] + geom.prob_hi[d]))
             for d, p in enumerate(positions)]
    ux_p, uy_p, uz_p, w_p = padded(ux), padded(uy), padded(uz), padded(w)

    def body(c, J3):
        sl = lambda a: lax.dynamic_slice_in_dim(a, c * chunk_size, chunk_size)  # noqa: E731
        jx, jy, jz = _esirkepov_body(
            [sl(p) for p in pos_p], sl(ux_p), sl(uy_p), sl(uz_p), sl(w_p),
            q, geom, dt, order, relative_time, origin, wrap, offset, out_shape,
        )
        return (J3[0] + jx, J3[1] + jy, J3[2] + jz)

    shape = out_shape or geom.n_cell
    init = tuple(jnp.zeros(shape, w.dtype) for _ in range(3))
    return lax.fori_loop(0, nchunks, body, init)


def _esirkepov_body(
    positions,
    ux, uy, uz, w,
    q: float,
    geom,
    dt: float,
    order: int,
    relative_time: float | None = None,
    origin=None,
    wrap: bool = True,
    offset: int = 0,
    out_shape=None,
    positions_old=None,
    gaminv_override=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Charge-conserving current deposition.

    ``positions`` are the already-pushed x^{n+1}; with the default
    relative_time = -dt/2 the old position x^n is reconstructed as
    x^{n+1} - dt*v (CurrentDeposition.H:725-738), and the deposited J is the
    Yee-staggered J^{n+1/2}.

    The implicit scheme passes ``positions_old`` (x^n) explicitly plus
    ``gaminv_override`` = 2/(gamma^n + gamma^{n+1}) with (ux..) = u^{n+1/2}
    (doChargeConservingDepositionShapeNImplicit, CurrentDeposition.H:934).
    """
    if relative_time is None:
        relative_time = -0.5 * dt
    ndim = geom.ndim
    n_cell = geom.n_cell
    shape = out_shape or n_cell
    lo_corner = origin if origin is not None else geom.prob_lo
    gaminv = (
        gaminv_override if gaminv_override is not None
        else _gaminv(ux, uy, uz)
    )
    wq = q * w
    dtype = w.dtype
    T = order + 3

    if ndim == 3:
        dxs = geom.dx
        invdtd = (
            1.0 / (dt * dxs[1] * dxs[2]),
            1.0 / (dt * dxs[0] * dxs[2]),
            1.0 / (dt * dxs[0] * dxs[1]),
        )
        vel = (ux * gaminv, uy * gaminv, uz * gaminv)
        new_g, old_g = [], []
        for d in range(3):
            xn = (
                positions[d] - lo_corner[d] + (relative_time + 0.5 * dt) * vel[d]
            ) / dxs[d]
            if positions_old is not None:
                xo = (positions_old[d] - lo_corner[d]) / dxs[d]
            else:
                xo = xn - dt / dxs[d] * vel[d]
            new_g.append(xn)
            old_g.append(xo)
        i0x, SNx, SOx = _tap_arrays(new_g[0], old_g[0], order)
        i0y, SNy, SOy = _tap_arrays(new_g[1], old_g[1], order)
        i0z, SNz, SOz = _tap_arrays(new_g[2], old_g[2], order)
        # tap axes lead; particle axis is last throughout: (Tx,Ty,Tz,np)
        CUMx = jnp.cumsum(SOx - SNx, axis=0)
        CUMy = jnp.cumsum(SOy - SNy, axis=0)
        CUMz = jnp.cumsum(SOz - SNz, axis=0)

        def tmix(SA_n, SA_o, SB_n, SB_o):
            # (Ta, Tb, np)
            return (
                (SA_n[:, None] * SB_n[None, :] + SA_o[:, None] * SB_o[None, :])
                / 3.0
                + (SA_n[:, None] * SB_o[None, :] + SA_o[:, None] * SB_n[None, :])
                / 6.0
            )

        Tyz = tmix(SNy, SOy, SNz, SOz)
        Txz = tmix(SNx, SOx, SNz, SOz)
        Txy = tmix(SNx, SOx, SNy, SOy)

        valx = (wq * invdtd[0]) * CUMx[:, None, None] * Tyz[None, :, :]
        valy = (wq * invdtd[1]) * CUMy[None, :, None] * Txz[:, None, :]
        valz = (wq * invdtd[2]) * CUMz[None, None, :] * Txy[:, :, None]

        ix = _tap_idx(i0x, T, n_cell[0], wrap, offset)
        iy = _tap_idx(i0y, T, n_cell[1], wrap, offset)
        iz = _tap_idx(i0z, T, n_cell[2], wrap, offset)
        IX = jnp.broadcast_to(ix[:, None, None], valx.shape)
        IY = jnp.broadcast_to(iy[None, :, None], valx.shape)
        IZ = jnp.broadcast_to(iz[None, None, :], valx.shape)

        jx = _scatter_add(jnp.zeros(shape, dtype), [IX, IY, IZ], valx)
        jy = _scatter_add(jnp.zeros(shape, dtype), [IX, IY, IZ], valy)
        jz = _scatter_add(jnp.zeros(shape, dtype), [IX, IY, IZ], valz)
        return jx, jy, jz

    if ndim == 2:  # XZ plane; reference CellSize maps (dx, 1, dz)
        dxs = (geom.dx[0], geom.dx[1])
        invvol = 1.0 / (dxs[0] * dxs[1])
        invdtd_x = 1.0 / (dt * dxs[1])
        invdtd_z = 1.0 / (dt * dxs[0])
        vx = ux * gaminv
        vy = uy * gaminv
        vz = uz * gaminv
        xn = (positions[0] - lo_corner[0] + (relative_time + 0.5 * dt) * vx) / dxs[0]
        zn = (positions[1] - lo_corner[1] + (relative_time + 0.5 * dt) * vz) / dxs[1]
        if positions_old is not None:
            xo = (positions_old[0] - lo_corner[0]) / dxs[0]
            zo = (positions_old[1] - lo_corner[1]) / dxs[1]
        else:
            xo = xn - dt / dxs[0] * vx
            zo = zn - dt / dxs[1] * vz
        i0x, SNx, SOx = _tap_arrays(xn, xo, order)
        i0z, SNz, SOz = _tap_arrays(zn, zo, order)
        CUMx = jnp.cumsum(SOx - SNx, axis=0)
        CUMz = jnp.cumsum(SOz - SNz, axis=0)

        mixxz = (
            (SNx[:, None] * SNz[None, :] + SOx[:, None] * SOz[None, :]) / 3.0
            + (SNx[:, None] * SOz[None, :] + SOx[:, None] * SNz[None, :]) / 6.0
        )
        valx = (wq * invdtd_x) * CUMx[:, None] * (0.5 * (SNz + SOz))[None, :]
        valy = (wq * vy * invvol) * mixxz
        valz = (wq * invdtd_z) * CUMz[None, :] * (0.5 * (SNx + SOx))[:, None]

        ix = _tap_idx(i0x, T, n_cell[0], wrap, offset)
        iz = _tap_idx(i0z, T, n_cell[1], wrap, offset)
        IX = jnp.broadcast_to(ix[:, None], valx.shape)
        IZ = jnp.broadcast_to(iz[None, :], valx.shape)
        jx = _scatter_add(jnp.zeros(shape, dtype), [IX, IZ], valx)
        jy = _scatter_add(jnp.zeros(shape, dtype), [IX, IZ], valy)
        jz = _scatter_add(jnp.zeros(shape, dtype), [IX, IZ], valz)
        return jx, jy, jz

    # 1D (z): transverse currents are direct, Jz is charge-conserving
    dz = geom.dx[0]
    invvol = 1.0 / dz
    vx = ux * gaminv
    vy = uy * gaminv
    vz = uz * gaminv
    zn = (positions[0] - lo_corner[0] + (relative_time + 0.5 * dt) * vz) / dz
    if positions_old is not None:
        zo = (positions_old[0] - lo_corner[0]) / dz
    else:
        zo = zn - dt / dz * vz
    i0z, SNz, SOz = _tap_arrays(zn, zo, order)
    CUMz = jnp.cumsum(SOz - SNz, axis=0)
    valx = (wq * vx * invvol) * 0.5 * (SOz + SNz)
    valy = (wq * vy * invvol) * 0.5 * (SOz + SNz)
    valz = (wq / dt) * CUMz
    iz = _tap_idx(i0z, T, n_cell[0], wrap, offset)
    jx = _scatter_add(jnp.zeros(shape, dtype), [iz], valx)
    jy = _scatter_add(jnp.zeros(shape, dtype), [iz], valy)
    jz = _scatter_add(jnp.zeros(shape, dtype), [iz], valz)
    return jx, jy, jz


def deposit_current_direct(
    positions: Sequence[jnp.ndarray],
    ux, uy, uz, w,
    q: float,
    geom,
    staggering: dict,
    dt: float,
    order: int,
    relative_time: float | None = None,
    origin=None,
    wrap: bool = True,
    offset: int = 0,
    out_shape=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Direct deposition of J = q*w*v at the time-midpoint position onto the
    staggered Yee J sites (CurrentDeposition.H:274: deposit at
    x + relative_time*v with relative_time = -dt/2 after the push)."""
    if relative_time is None:
        relative_time = -0.5 * dt
    ndim = geom.ndim
    n_cell = geom.n_cell
    shape = out_shape or n_cell
    lo_corner = origin if origin is not None else geom.prob_lo
    gaminv = _gaminv(ux, uy, uz)
    invvol = 1.0 / geom.cell_volume
    vels = (ux * gaminv, uy * gaminv, uz * gaminv)
    # active-axis velocity per dim for the midpoint shift
    if ndim == 3:
        active_v = vels
    elif ndim == 2:
        active_v = (vels[0], vels[2])
    else:
        active_v = (vels[2],)
    coords = [
        (positions[d] - lo_corner[d] + relative_time * active_v[d]) / geom.dx[d]
        for d in range(ndim)
    ]
    out = []
    for comp, vcomp in (("jx", vels[0]), ("jy", vels[1]), ("jz", vels[2])):
        flags = staggering[comp]
        starts, weights = [], []
        for d in range(ndim):
            xd = coords[d] - 0.5 if flags[d] == 0 else coords[d]
            i0, ws = shape_weights(xd, order)
            starts.append(i0)
            weights.append(ws)
        wqv = q * w * vcomp * invvol
        vals, idxs = [], []
        for taps in itertools.product(*[range(order + 1)] * ndim):
            val = wqv
            for d in range(ndim):
                val = val * weights[d][taps[d]]
            vals.append(val)
            if wrap:
                idxs.append(
                    [jnp.mod(starts[d] + taps[d] + offset, n_cell[d]) for d in range(ndim)]
                )
            else:
                idxs.append([starts[d] + taps[d] + offset for d in range(ndim)])
        values = jnp.stack(vals, axis=0)  # (ntaps, np): particle axis last
        idx_per_dim = [
            jnp.stack([ix[d] for ix in idxs], axis=0) for d in range(ndim)
        ]
        out.append(
            _scatter_add(jnp.zeros(shape, dtype=w.dtype), idx_per_dim, values)
        )
    return tuple(out)


def deposit_current_vay(
    positions: Sequence[jnp.ndarray],
    ux, uy, uz, w,
    q: float,
    geom,
    dt: float,
    order: int,
    origin=None,
    wrap: bool = True,
    offset: int = 0,
    out_shape=None,
    chunk_size: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vay deposition (PSATD-only): deposits the NODAL D arrays whose k-space
    division by i*k_mod yields the charge-conserving J
    (CurrentDeposition.H:1857-2135 doVayDepositionShapeN; the spectral
    division happens in PsatdSolver.push).  2D/3D only, like the reference.
    """
    ndim = geom.ndim
    if ndim == 1:
        raise NotImplementedError("Vay deposition not implemented in 1D")
    n_cell = geom.n_cell
    shape = out_shape or n_cell
    lo_corner = origin if origin is not None else geom.prob_lo
    dxs = geom.dx
    dtype = positions[0].dtype
    cap = positions[0].shape[0]
    invvol = 1.0 / geom.cell_volume
    invdt = 1.0 / dt
    gaminv = _gaminv(ux, uy, uz)
    T = order + 3

    def body(sl):
        vel3 = [ux[sl] * gaminv[sl], uy[sl] * gaminv[sl], uz[sl] * gaminv[sl]]
        wq = (q * w[sl]) * invvol
        taps = []
        for d in range(ndim):
            v_act = vel3[d] if ndim == 3 else vel3[(0, 2)[d]]
            xn = (positions[d][sl] - lo_corner[d]) / dxs[d]
            xo = xn - v_act * dt / dxs[d]
            taps.append(_tap_arrays(xn, xo, order))
        if ndim == 3:
            (ix, SNx, SOx), (iy, SNy, SOy), (iz, SNz, SOz) = taps
            # products on the common window, particle axis LAST
            def outer(a, b, c):
                return (
                    a[:, None, None, :] * b[None, :, None, :]
                    * c[None, None, :, :]
                )
            f = wq * invdt
            t0 = f * (outer(SNx, SNy, SNz) - outer(SOx, SOy, SOz))
            t1 = f * (outer(SNx, SNy, SOz) - outer(SOx, SOy, SNz))
            t2 = f * (outer(SNx, SOy, SNz) - outer(SOx, SNy, SOz))
            t3 = f * (outer(SOx, SNy, SNz) - outer(SNx, SOy, SOz))
            dxv = (2 * t0 + t1 + t2 - 2 * t3) / 6.0
            dyv = (2 * t0 + t1 - 2 * t2 + t3) / 6.0
            dzv = (2 * t0 - 2 * t1 + t2 + t3) / 6.0
            IX = _tap_idx(ix, T, n_cell[0], wrap, offset)
            IY = _tap_idx(iy, T, n_cell[1], wrap, offset)
            IZ = _tap_idx(iz, T, n_cell[2], wrap, offset)
            idx = [
                IX[:, None, None, :] + 0 * IY[None, :, None, :] + 0 * IZ[None, None, :, :],
                0 * IX[:, None, None, :] + IY[None, :, None, :] + 0 * IZ[None, None, :, :],
                0 * IX[:, None, None, :] + 0 * IY[None, :, None, :] + IZ[None, None, :, :],
            ]
            return [(idx, dxv), (idx, dyv), (idx, dzv)]
        # 2D (x,z): Dy is the direct deposit of wq*vy on averaged shapes
        (ix, SNx, SOx), (iz, SNz, SOz) = taps
        f = wq * invdt
        t0 = f * (
            SNx[:, None, :] * SNz[None, :, :] - SOx[:, None, :] * SOz[None, :, :]
        )
        t1 = f * (
            SNx[:, None, :] * SOz[None, :, :] - SOx[:, None, :] * SNz[None, :, :]
        )
        dxv = 0.5 * (t0 + t1)
        dzv = 0.5 * (t0 - t1)
        dyv = (wq * vel3[1] * 0.25) * (
            (SNx + SOx)[:, None, :] * (SNz + SOz)[None, :, :]
        )
        IX = _tap_idx(ix, T, n_cell[0], wrap, offset)
        IZ = _tap_idx(iz, T, n_cell[1], wrap, offset)
        idx = [
            IX[:, None, :] + 0 * IZ[None, :, :],
            0 * IX[:, None, :] + IZ[None, :, :],
        ]
        return [(idx, dxv), (idx, dyv), (idx, dzv)]

    outs = [jnp.zeros(shape, dtype) for _ in range(3)]
    step_sz = chunk_size or cap
    for s0 in range(0, cap, max(step_sz, 1)):
        sl = slice(s0, min(s0 + step_sz, cap))
        parts = body(sl)
        for i, (idx, vals) in enumerate(parts):
            outs[i] = _scatter_add(outs[i], idx, vals)
    return tuple(outs)
