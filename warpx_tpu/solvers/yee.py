"""FDTD Maxwell updates on the staggered Yee mesh (periodic torus form).

Reimplements FiniteDifferenceSolver::EvolveB / EvolveE with the Yee stencil
(reference: Source/FieldSolver/FiniteDifferenceSolver/EvolveB.cpp:120-190,
EvolveE.cpp:120-215, CartesianYeeAlgorithm.H UpwardD*/DownwardD* first-order
differences).  On a periodic domain the guard-cell exchange is realized by
jnp.roll; XLA fuses the rolls and axpys into a handful of bandwidth-bound
loops, which is the right TPU formulation (no explicit halo pass needed on a
single shard).

dB/dt = -curl E   (upward differences: component sites sit half a cell below)
dE/dt = c^2 (curl B - mu0 J)   (downward differences)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import c as _c
from ..constants import mu0 as _mu0
from ..core.state import FieldState

__all__ = ["evolve_b", "evolve_e", "compute_dt_yee", "compute_div_e", "compute_div_b"]

_c2 = _c * _c


def _up(F, axis, inv_d):
    return (jnp.roll(F, -1, axis) - F) * inv_d


def _down(F, axis, inv_d):
    return (F - jnp.roll(F, 1, axis)) * inv_d


def compute_dt_yee(geom, cfl: float) -> float:
    """CFL timestep, bit-identical to the reference arithmetic
    (CartesianYeeAlgorithm.H:48-56: deltat = 1/(sqrt(sum 1/dx_i^2)*c), then
    WarpXComputeDt.cpp: dt = cfl*deltat — the rounding order matters for
    moving-window shift counts on boundary-crossing steps)."""
    s = 0.0
    for d in geom.dx:
        s += 1.0 / (d * d)
    deltat = 1.0 / ((s ** 0.5) * _c)
    return cfl * deltat


def evolve_b(fields: FieldState, geom, dt: float) -> FieldState:
    ndim = geom.ndim
    Ex, Ey, Ez = fields.Ex, fields.Ey, fields.Ez
    if ndim == 3:
        idx, idy, idz = (1.0 / d for d in geom.dx)
        ax, ay, az = 0, 1, 2
        Bx = fields.Bx + dt * (_up(Ey, az, idz) - _up(Ez, ay, idy))
        By = fields.By + dt * (_up(Ez, ax, idx) - _up(Ex, az, idz))
        Bz = fields.Bz + dt * (_up(Ex, ay, idy) - _up(Ey, ax, idx))
    elif ndim == 2:  # axes (x, z); d/dy = 0
        idx, idz = (1.0 / d for d in geom.dx)
        ax, az = 0, 1
        Bx = fields.Bx + dt * _up(Ey, az, idz)
        By = fields.By + dt * (_up(Ez, ax, idx) - _up(Ex, az, idz))
        Bz = fields.Bz - dt * _up(Ey, ax, idx)
    else:  # 1D (z)
        idz = 1.0 / geom.dx[0]
        Bx = fields.Bx + dt * _up(Ey, 0, idz)
        By = fields.By - dt * _up(Ex, 0, idz)
        Bz = fields.Bz
    return fields.replace(Bx=Bx, By=By, Bz=Bz)


def evolve_e(fields: FieldState, geom, dt: float) -> FieldState:
    ndim = geom.ndim
    Bx, By, Bz = fields.Bx, fields.By, fields.Bz
    jx, jy, jz = fields.jx, fields.jy, fields.jz
    k = _c2 * dt
    if ndim == 3:
        idx, idy, idz = (1.0 / d for d in geom.dx)
        ax, ay, az = 0, 1, 2
        Ex = fields.Ex + k * (_down(Bz, ay, idy) - _down(By, az, idz) - _mu0 * jx)
        Ey = fields.Ey + k * (_down(Bx, az, idz) - _down(Bz, ax, idx) - _mu0 * jy)
        Ez = fields.Ez + k * (_down(By, ax, idx) - _down(Bx, ay, idy) - _mu0 * jz)
    elif ndim == 2:
        idx, idz = (1.0 / d for d in geom.dx)
        ax, az = 0, 1
        Ex = fields.Ex + k * (-_down(By, az, idz) - _mu0 * jx)
        Ey = fields.Ey + k * (_down(Bx, az, idz) - _down(Bz, ax, idx) - _mu0 * jy)
        Ez = fields.Ez + k * (_down(By, ax, idx) - _mu0 * jz)
    else:
        idz = 1.0 / geom.dx[0]
        Ex = fields.Ex + k * (-_down(By, 0, idz) - _mu0 * jx)
        Ey = fields.Ey + k * (_down(Bx, 0, idz) - _mu0 * jy)
        Ez = fields.Ez + k * (-_mu0 * jz)
    return fields.replace(Ex=Ex, Ey=Ey, Ez=Ez)


def compute_div_e(fields: FieldState, geom) -> jnp.ndarray:
    """Nodal div(E) (reference: ComputeDivE.cpp; downward diffs onto nodes)."""
    ndim = geom.ndim
    if ndim == 3:
        idx, idy, idz = (1.0 / d for d in geom.dx)
        return (
            _down(fields.Ex, 0, idx)
            + _down(fields.Ey, 1, idy)
            + _down(fields.Ez, 2, idz)
        )
    if ndim == 2:
        idx, idz = (1.0 / d for d in geom.dx)
        return _down(fields.Ex, 0, idx) + _down(fields.Ez, 1, idz)
    idz = 1.0 / geom.dx[0]
    return _down(fields.Ez, 0, idz)


def compute_div_b(fields: FieldState, geom) -> jnp.ndarray:
    """Cell-centered div(B) (upward diffs from faces to centers)."""
    ndim = geom.ndim
    if ndim == 3:
        idx, idy, idz = (1.0 / d for d in geom.dx)
        return (
            _up(fields.Bx, 0, idx) + _up(fields.By, 1, idy) + _up(fields.Bz, 2, idz)
        )
    if ndim == 2:
        idx, idz = (1.0 / d for d in geom.dx)
        return _up(fields.Bx, 0, idx) + _up(fields.Bz, 1, idz)
    idz = 1.0 / geom.dx[0]
    return _up(fields.Bz, 0, idz)
