"""Energy-conserving implicit field gather (Esirkepov-stencil variant).

Reimplements doGatherShapeNEsirkepovStencilImplicit (reference:
Source/Particles/Gather/FieldGather.H:446-860) vectorized over particles:
the fields are gathered with the SAME Esirkepov path weights used by the
charge-conserving deposition over the n -> n+1 trajectory, which is what
makes the theta-implicit scheme exactly energy conserving (Angus et al.,
JCP 491 (2023)).

Weight vocabulary (per dim, over the T = order+3 tap window):
  ov[t]  = cumsum(s_old - s_new)[t] / (x_new - x_old)   (1 when no motion)
  av[t]  = 0.5*(s_new + s_old)[t]
  mix[t1,t2] = (sn1*sn2 + so1*so2)/3 + (sn1*so2 + so1*sn2)/6

3D:  Ex ~ ov_x*mix_yz on the E window (nodal shape evaluations);
     Bx ~ ov_x*mix_yz on the B window (shapes evaluated at coord - 1/2).
2D (XZ): Ex,Bz ~ ov_x*av_z ; Ey ~ mix_xz ; Ez,Bx ~ av_x*ov_z ;
     By ~ mix at order-1 on the half-shifted window.
1D (Z):  Ex,Ey,Bz ~ av_z ; Ez,Bx,By ~ ov_z.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from .shapes import esirkepov_weights

__all__ = ["gather_eb_implicit"]


def _weights(x_new, x_old, order, dtype):
    """(i0, sn, so, ov, av) stacked over the tap axis (T, np)."""
    i0, sn_l, so_l = esirkepov_weights(x_new, x_old, order)
    sn = jnp.stack(sn_l, axis=0)
    so = jnp.stack(so_l, axis=0)
    cum = jnp.cumsum(so - sn, axis=0)
    delta = x_new - x_old
    ov = jnp.where(delta == 0.0, 1.0, cum / jnp.where(delta == 0.0, 1.0, delta))
    av = 0.5 * (sn + so)
    return i0, sn, so, ov, av


def _mix(sn1, so1, sn2, so2):
    third, sixth = 1.0 / 3.0, 1.0 / 6.0
    return (
        (sn1[:, None] * sn2[None, :] + so1[:, None] * so2[None, :]) * third
        + (sn1[:, None] * so2[None, :] + so1[:, None] * sn2[None, :]) * sixth
    )


def _win_idx(i0, T, n):
    # (T, np) periodic window indices
    return jnp.mod(i0[None, :] + jnp.arange(T)[:, None], n)


def _sum3(field, idx, wgt):
    """sum over 3D tap window: field[(i,j,k)] * wgt[t1,t2,t3,np]."""
    ix, iy, iz = idx
    vals = field[
        ix[:, None, None, :], iy[None, :, None, :], iz[None, None, :, :]
    ]
    return jnp.sum(vals * wgt, axis=(0, 1, 2))


def gather_eb_implicit(
    pos_n: Sequence[jnp.ndarray],
    pos_nph: Sequence[jnp.ndarray],
    field_arrays: dict,
    geom,
    order: int,
) -> Tuple[jnp.ndarray, ...]:
    """Gather (Ex..Bz) with implicit Esirkepov-stencil weights.

    pos_n: positions at time n; pos_nph: positions at n+1/2 (the new full
    position is reconstructed as 2*pos_nph - pos_n, FieldGather.H:488-494).
    Periodic domains only.
    """
    ndim = geom.ndim
    dx = geom.dx
    lo = geom.prob_lo
    n_cell = geom.n_cell
    T = order + 3
    F = field_arrays
    dtype = pos_n[0].dtype

    new_g, old_g = [], []
    for d in range(ndim):
        xn = (2.0 * pos_nph[d] - pos_n[d] - lo[d]) / dx[d]
        xo = (pos_n[d] - lo[d]) / dx[d]
        new_g.append(xn)
        old_g.append(xo)

    if ndim == 3:
        we = [_weights(new_g[d], old_g[d], order, dtype) for d in range(3)]
        wb = [
            _weights(new_g[d] - 0.5, old_g[d] - 0.5, order, dtype)
            for d in range(3)
        ]
        idx_e = [_win_idx(we[d][0], T, n_cell[d]) for d in range(3)]
        idx_b = [_win_idx(wb[d][0], T, n_cell[d]) for d in range(3)]

        def mix_of(w1, w2):
            # (T, T, np)
            sn1, so1 = w1[1], w1[2]
            sn2, so2 = w2[1], w2[2]
            return (
                (sn1[:, None] * sn2[None, :] + so1[:, None] * so2[None, :])
                / 3.0
                + (sn1[:, None] * so2[None, :] + so1[:, None] * sn2[None, :])
                / 6.0
            )

        out = []
        for comp, w3, idx3 in (("E", we, idx_e), ("B", wb, idx_b)):
            ovx, ovy, ovz = w3[0][3], w3[1][3], w3[2][3]
            myz = mix_of(w3[1], w3[2])
            mxz = mix_of(w3[0], w3[2])
            mxy = mix_of(w3[0], w3[1])
            wx = ovx[:, None, None, :] * myz[None, :, :, :]
            wy = ovy[None, :, None, :] * mxz[:, None, :, :]
            wz = ovz[None, None, :, :] * mxy[:, :, None, :]
            names = ("Ex", "Ey", "Ez") if comp == "E" else ("Bx", "By", "Bz")
            out.append(_sum3(F[names[0]], idx3, wx))
            out.append(_sum3(F[names[1]], idx3, wy))
            out.append(_sum3(F[names[2]], idx3, wz))
        ex, ey, ez, bx, by, bz = out
        return ex, ey, ez, bx, by, bz

    if ndim == 2:  # XZ
        wx = _weights(new_g[0], old_g[0], order, dtype)
        wz = _weights(new_g[1], old_g[1], order, dtype)
        ix = _win_idx(wx[0], T, n_cell[0])
        iz = _win_idx(wz[0], T, n_cell[1])

        def s2(field, wgt, ix_, iz_):
            vals = field[ix_[:, None, :], iz_[None, :, :]]
            return jnp.sum(vals * wgt, axis=(0, 1))

        ovx, avx = wx[3], wx[4]
        ovz, avz = wz[3], wz[4]
        w_ex = ovx[:, None, :] * avz[None, :, :]
        w_ey = _mix_stacked(wx, wz)
        w_ez = avx[:, None, :] * ovz[None, :, :]
        ex = s2(F["Ex"], w_ex, ix, iz)
        bz = s2(F["Bz"], w_ex, ix, iz)
        ey = s2(F["Ey"], w_ey, ix, iz)
        ez = s2(F["Ez"], w_ez, ix, iz)
        bx = s2(F["Bx"], w_ez, ix, iz)
        # By: order-1 shapes on the half-shifted window (FieldGather.H:561-566)
        Tb = (order - 1) + 3
        wxb = _weights(new_g[0] - 0.5, old_g[0] - 0.5, order - 1, dtype)
        wzb = _weights(new_g[1] - 0.5, old_g[1] - 0.5, order - 1, dtype)
        ixb = _win_idx(wxb[0], Tb, n_cell[0])
        izb = _win_idx(wzb[0], Tb, n_cell[1])
        by = s2(F["By"], _mix_stacked(wxb, wzb), ixb, izb)
        return ex, ey, ez, bx, by, bz

    # 1D (z)
    wz = _weights(new_g[0], old_g[0], order, dtype)
    iz = _win_idx(wz[0], T, n_cell[0])
    ovz, avz = wz[3], wz[4]

    def s1(field, wgt):
        return jnp.sum(field[iz] * wgt, axis=0)

    ex = s1(F["Ex"], avz)
    ey = s1(F["Ey"], avz)
    bz = s1(F["Bz"], avz)
    ez = s1(F["Ez"], ovz)
    bx = s1(F["Bx"], ovz)
    by = s1(F["By"], ovz)
    return ex, ey, ez, bx, by, bz


def _mix_stacked(w1, w2):
    """(T, T, np) Esirkepov transverse mix from two _weights tuples."""
    return _mix(w1[1], w1[2], w2[1], w2[2])
