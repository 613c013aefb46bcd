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
from ..constants import ep0 as _ep0
from ..constants import mu0 as _mu0
from ..core.state import FieldState

__all__ = [
    "evolve_b", "evolve_e", "compute_dt_yee", "compute_dt_ckc",
    "compute_div_e", "compute_div_b",
    "evolve_f", "evolve_g", "add_grad_f", "add_grad_g",
]

_c2 = _c * _c


def _up(F, axis, inv_d):
    return (jnp.roll(F, -1, axis) - F) * inv_d


def _down(F, axis, inv_d):
    return (F - jnp.roll(F, 1, axis)) * inv_d


def compute_dt_ckc(geom, cfl: float) -> float:
    """CKC timestep (CartesianCKCAlgorithm.H ComputeMaxDt: min cell size /c)."""
    return cfl * (min(geom.dx) / _c)


def _ckc_coefs(geom):
    """Cole-Karkkainen-Cowan stencil coefficients
    (CartesianCKCAlgorithm.H:36-105, Cowan PRST-AB 16, 041303)."""
    ndim = geom.ndim
    if ndim == 3:
        inv = [1.0 / d for d in geom.dx]
        delta = max(inv)
        rx, ry, rz = [(v / delta) ** 2 for v in inv]
        beta = 0.125 * (1.0 - rx * ry * rz / (ry * rz + rz * rx + rx * ry))
        inv_r = 1.0 / (ry * rz + rz * rx + rx * ry)
        gx = ry * rz * (0.0625 - 0.125 * ry * rz * inv_r)
        gy = rx * rz * (0.0625 - 0.125 * rx * rz * inv_r)
        gz = rx * ry * (0.0625 - 0.125 * rx * ry * inv_r)
        return {
            "alphax": (1 - 2 * ry * beta - 2 * rz * beta - 4 * gx) * inv[0],
            "alphay": (1 - 2 * rx * beta - 2 * rz * beta - 4 * gy) * inv[1],
            "alphaz": (1 - 2 * rx * beta - 2 * ry * beta - 4 * gz) * inv[2],
            "betaxy": ry * beta * inv[0], "betaxz": rz * beta * inv[0],
            "betayx": rx * beta * inv[1], "betayz": rz * beta * inv[1],
            "betazx": rx * beta * inv[2], "betazy": ry * beta * inv[2],
            "gammax": gx * inv[0], "gammay": gy * inv[1], "gammaz": gz * inv[2],
        }
    if ndim == 2:
        inv = [1.0 / d for d in geom.dx]
        delta = max(inv)
        rx, rz = (inv[0] / delta) ** 2, (inv[1] / delta) ** 2
        beta = 0.125
        return {
            "alphax": (1 - 2 * rz * beta) * inv[0],
            "alphaz": (1 - 2 * rx * beta) * inv[1],
            "betaxz": beta * rz * inv[0], "betazx": beta * rx * inv[1],
        }
    return {"alphaz": 1.0 / geom.dx[0]}


def _up_ckc(F, daxis, coefs, geom, prefix):
    """CKC extended upward difference along array axis ``daxis``."""
    ndim = geom.ndim
    def sh(arr, ax, n):
        return jnp.roll(arr, -n, ax) if n else arr
    d1 = lambda arr, ax: jnp.roll(arr, -1, ax) - arr  # noqa: E731
    if ndim == 3:
        others = [a for a in range(3) if a != daxis]
        a, b = others
        alpha = coefs["alpha" + prefix[0]]
        beta_a = coefs["beta" + prefix[0] + "xyz"[a]]
        beta_b = coefs["beta" + prefix[0] + "xyz"[b]]
        gamma = coefs["gamma" + prefix[0]]
        base = d1(F, daxis)
        term = alpha * base
        term = term + beta_a * (jnp.roll(base, -1, a) + jnp.roll(base, 1, a))
        term = term + beta_b * (jnp.roll(base, -1, b) + jnp.roll(base, 1, b))
        term = term + gamma * (
            jnp.roll(jnp.roll(base, -1, a), -1, b)
            + jnp.roll(jnp.roll(base, 1, a), -1, b)
            + jnp.roll(jnp.roll(base, -1, a), 1, b)
            + jnp.roll(jnp.roll(base, 1, a), 1, b)
        )
        return term
    if ndim == 2:
        other = 1 - daxis
        alpha = coefs["alpha" + prefix[0]]
        beta = coefs["betaxz"] if daxis == 0 else coefs["betazx"]
        base = d1(F, daxis)
        return alpha * base + beta * (
            jnp.roll(base, -1, other) + jnp.roll(base, 1, other)
        )
    return coefs["alphaz"] * d1(F, 0)


def _centered(F, axis, inv_d):
    """Collocated-grid centered difference (CartesianNodalAlgorithm.H)."""
    return 0.5 * inv_d * (jnp.roll(F, -1, axis) - jnp.roll(F, 1, axis))


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


def evolve_b(fields: FieldState, geom, dt: float, algo: str = "yee") -> FieldState:
    ndim = geom.ndim
    Ex, Ey, Ez = fields.Ex, fields.Ey, fields.Ez
    if algo == "nodal":
        inv = [1.0 / d for d in geom.dx]
        if ndim == 3:
            Bx = fields.Bx + dt * (_centered(Ey, 2, inv[2]) - _centered(Ez, 1, inv[1]))
            By = fields.By + dt * (_centered(Ez, 0, inv[0]) - _centered(Ex, 2, inv[2]))
            Bz = fields.Bz + dt * (_centered(Ex, 1, inv[1]) - _centered(Ey, 0, inv[0]))
        elif ndim == 2:
            Bx = fields.Bx + dt * _centered(Ey, 1, inv[1])
            By = fields.By + dt * (_centered(Ez, 0, inv[0]) - _centered(Ex, 1, inv[1]))
            Bz = fields.Bz - dt * _centered(Ey, 0, inv[0])
        else:
            Bx = fields.Bx + dt * _centered(Ey, 0, inv[0])
            By = fields.By - dt * _centered(Ex, 0, inv[0])
            Bz = fields.Bz
        return fields.replace(Bx=Bx, By=By, Bz=Bz)
    if algo == "ckc":
        coefs = _ckc_coefs(geom)
        if ndim == 3:
            upx = lambda F: _up_ckc(F, 0, coefs, geom, "x")  # noqa: E731
            upy = lambda F: _up_ckc(F, 1, coefs, geom, "y")  # noqa: E731
            upz = lambda F: _up_ckc(F, 2, coefs, geom, "z")  # noqa: E731
            Bx = fields.Bx + dt * (upz(Ey) - upy(Ez))
            By = fields.By + dt * (upx(Ez) - upz(Ex))
            Bz = fields.Bz + dt * (upy(Ex) - upx(Ey))
        elif ndim == 2:
            upx = lambda F: _up_ckc(F, 0, coefs, geom, "x")  # noqa: E731
            upz = lambda F: _up_ckc(F, 1, coefs, geom, "z")  # noqa: E731
            Bx = fields.Bx + dt * upz(Ey)
            By = fields.By + dt * (upx(Ez) - upz(Ex))
            Bz = fields.Bz - dt * upx(Ey)
        else:
            upz = lambda F: _up_ckc(F, 0, coefs, geom, "z")  # noqa: E731
            Bx = fields.Bx + dt * upz(Ey)
            By = fields.By - dt * upz(Ex)
            Bz = fields.Bz
        return fields.replace(Bx=Bx, By=By, Bz=Bz)
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


def evolve_e(fields: FieldState, geom, dt: float, algo: str = "yee") -> FieldState:
    ndim = geom.ndim
    Bx, By, Bz = fields.Bx, fields.By, fields.Bz
    jx, jy, jz = fields.jx, fields.jy, fields.jz
    k = _c2 * dt
    if algo == "nodal":
        inv = [1.0 / d for d in geom.dx]
        if ndim == 3:
            Ex = fields.Ex + k * (_centered(Bz, 1, inv[1]) - _centered(By, 2, inv[2]) - _mu0 * jx)
            Ey = fields.Ey + k * (_centered(Bx, 2, inv[2]) - _centered(Bz, 0, inv[0]) - _mu0 * jy)
            Ez = fields.Ez + k * (_centered(By, 0, inv[0]) - _centered(Bx, 1, inv[1]) - _mu0 * jz)
        elif ndim == 2:
            Ex = fields.Ex + k * (-_centered(By, 1, inv[1]) - _mu0 * jx)
            Ey = fields.Ey + k * (_centered(Bx, 1, inv[1]) - _centered(Bz, 0, inv[0]) - _mu0 * jy)
            Ez = fields.Ez + k * (_centered(By, 0, inv[0]) - _mu0 * jz)
        else:
            inv_z = inv[0]
            Ex = fields.Ex + k * (-_centered(By, 0, inv_z) - _mu0 * jx)
            Ey = fields.Ey + k * (_centered(Bx, 0, inv_z) - _mu0 * jy)
            Ez = fields.Ez + k * (-_mu0 * jz)
        return fields.replace(Ex=Ex, Ey=Ey, Ez=Ez)
    # ckc uses the plain Yee downward differences for E (CartesianCKCAlgorithm
    # DownwardD* are the ordinary staggered differences)
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


def evolve_f(F, fields: FieldState, rho, geom, dt: float, algo: str = "yee"):
    """div-E cleaning scalar: F += dt*(divE - rho/eps0)
    (reference: EvolveF.cpp:119-126; F lives on nodes for staggered grids)."""
    ndim = geom.ndim
    d = _centered if algo == "nodal" else _down
    inv = [1.0 / x for x in geom.dx]
    if ndim == 3:
        div = (
            d(fields.Ex, 0, inv[0]) + d(fields.Ey, 1, inv[1])
            + d(fields.Ez, 2, inv[2])
        )
    elif ndim == 2:
        div = d(fields.Ex, 0, inv[0]) + d(fields.Ez, 1, inv[1])
    else:
        div = d(fields.Ez, 0, inv[0])
    return F + dt * (div - rho / _ep0)


def evolve_g(G, fields: FieldState, geom, dt: float, algo: str = "yee"):
    """div-B cleaning scalar: G += c^2*dt*divB
    (reference: EvolveG.cpp:108-112; G is cell-centered for staggered grids)."""
    ndim = geom.ndim
    d = _centered if algo == "nodal" else _up
    inv = [1.0 / x for x in geom.dx]
    if ndim == 3:
        div = (
            d(fields.Bx, 0, inv[0]) + d(fields.By, 1, inv[1])
            + d(fields.Bz, 2, inv[2])
        )
    elif ndim == 2:
        div = d(fields.Bx, 0, inv[0]) + d(fields.Bz, 1, inv[1])
    else:
        div = d(fields.Bz, 0, inv[0])
    return G + _c2 * dt * div


def add_grad_f(fields: FieldState, F, geom, dt: float, algo: str = "yee"):
    """Hyperbolic charge-conservation correction: E += c^2*dt*grad(F)
    (reference: EvolveE.cpp:218-240)."""
    ndim = geom.ndim
    d = _centered if algo == "nodal" else _up
    inv = [1.0 / x for x in geom.dx]
    k = _c2 * dt
    if ndim == 3:
        return fields.replace(
            Ex=fields.Ex + k * d(F, 0, inv[0]),
            Ey=fields.Ey + k * d(F, 1, inv[1]),
            Ez=fields.Ez + k * d(F, 2, inv[2]),
        )
    if ndim == 2:
        return fields.replace(
            Ex=fields.Ex + k * d(F, 0, inv[0]),
            Ez=fields.Ez + k * d(F, 1, inv[1]),
        )
    return fields.replace(Ez=fields.Ez + k * d(F, 0, inv[0]))


def add_grad_g(fields: FieldState, G, geom, dt: float, algo: str = "yee"):
    """div-B cleaning correction: B += dt*grad(G)
    (reference: EvolveB.cpp:192-209)."""
    ndim = geom.ndim
    d = _centered if algo == "nodal" else _down
    inv = [1.0 / x for x in geom.dx]
    if ndim == 3:
        return fields.replace(
            Bx=fields.Bx + dt * d(G, 0, inv[0]),
            By=fields.By + dt * d(G, 1, inv[1]),
            Bz=fields.Bz + dt * d(G, 2, inv[2]),
        )
    if ndim == 2:
        return fields.replace(
            Bx=fields.Bx + dt * d(G, 0, inv[0]),
            Bz=fields.Bz + dt * d(G, 1, inv[1]),
        )
    return fields.replace(Bz=fields.Bz + dt * d(G, 0, inv[0]))


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
