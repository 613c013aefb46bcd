"""Macroscopic Maxwell solver: media with conductivity/permittivity/permeability.

Reimplements the reference's macroscopic E-update (reference:
Source/FieldSolver/FiniteDifferenceSolver/MacroscopicEvolveE.cpp:180-300,
coefficient schemes MacroscopicProperties.H:137-192):

  E^{n+1} = alpha * E^n + beta * (curl(B/mu) - J)

with per-cell sigma (conductivity), epsilon (permittivity), mu (permeability):

  Lax-Wendroff  : alpha = (1 - f)/(1 + f), beta = dt/(eps (1 + f)), f = s dt/2e
  Backward Euler: alpha = 1/(1 + f),       beta = dt/(eps (1 + f)), f = s dt/e

Material properties are cell-centered (MacroscopicProperties.cpp:121-131);
sigma and epsilon are averaged to each E component's staggered location
(ablastr::coarsen::sample::Interp), while H = B/mu divides by mu at the B
component's own integer index (FieldAccessorFunctors.H operator()).  The B
update is the ordinary Faraday law (EvolveB, unchanged by the medium).

Works with Yee and CKC E-stencils on staggered grids, 1D/2D/3D (the reference
forbids collocated grids and RZ, MacroscopicEvolveE.cpp:94-97).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import ep0 as _ep0
from ..constants import mu0 as _mu0
from ..core.state import FieldState

__all__ = ["MacroscopicMedium", "evolve_e_macroscopic"]


def _cc_coords(geom):
    """Cell-center (x, y, z) coordinate arrays over the grid (y=0 in 2D)."""
    ndim = geom.ndim
    axes = [geom.cell_centers(d) for d in range(ndim)]
    mesh = np.meshgrid(*axes, indexing="ij")
    if ndim == 3:
        return mesh[0], mesh[1], mesh[2]
    if ndim == 2:  # (x, z)
        return mesh[0], np.zeros_like(mesh[0]), mesh[1]
    return np.zeros_like(mesh[0]), np.zeros_like(mesh[0]), mesh[0]


def _avg_to(arr: jnp.ndarray, e_flags: Tuple[int, ...]) -> jnp.ndarray:
    """Average a cell-centered array to an E component's staggered location.

    For each dim where the component is nodal (flag 1) the two adjacent cell
    centers are averaged (periodic wrap); cell-centered dims (flag 0) keep
    the same index — exactly ablastr::coarsen::sample::Interp with cr=1.
    """
    out = arr
    for d, flag in enumerate(e_flags):
        if flag == 1:
            out = 0.5 * (out + jnp.roll(out, 1, axis=d))
    return out


@dataclasses.dataclass(frozen=True)
class MacroscopicMedium:
    """Precomputed per-component alpha/beta coefficient arrays + 1/mu."""

    alpha: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    beta: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    inv_mu: jnp.ndarray  # cell-centered

    @classmethod
    def create(cls, cfg, staggering, dtype=jnp.float64) -> "MacroscopicMedium":
        from ..utils.expression import compile_expression

        geom = cfg.geometry
        consts = dict(cfg.user_constants or ())

        def build(value, func, default):
            if func:
                fn = compile_expression(func, ("x", "y", "z"), consts)
                x, y, z = _cc_coords(geom)
                return jnp.asarray(fn(x, y, z), dtype) * jnp.ones(
                    geom.n_cell, dtype
                )
            v = default if value is None else value
            return jnp.full(geom.n_cell, v, dtype)

        sigma = build(cfg.macro_sigma, cfg.macro_sigma_function, 0.0)
        eps = build(cfg.macro_epsilon, cfg.macro_epsilon_function, _ep0)
        mu = build(cfg.macro_mu, cfg.macro_mu_function, _mu0)
        if float(jnp.min(eps)) <= 0.0:
            raise ValueError("macroscopic epsilon must be strictly positive")

        lax_wendroff = cfg.macroscopic_sigma_method == "laxwendroff"
        dt = cfg.dt
        alphas, betas = [], []
        for comp in ("Ex", "Ey", "Ez"):
            s = _avg_to(sigma, staggering[comp])
            e = _avg_to(eps, staggering[comp])
            if lax_wendroff:
                f = 0.5 * s * dt / e
                alphas.append((1.0 - f) / (1.0 + f))
            else:
                f = s * dt / e
                alphas.append(1.0 / (1.0 + f))
            betas.append(dt / (e * (1.0 + f)))
        return cls(alpha=tuple(alphas), beta=tuple(betas),
                   inv_mu=1.0 / mu)


def evolve_e_macroscopic(
    fields: FieldState, medium: MacroscopicMedium, geom, dt: float,
    algo: str = "yee",
) -> FieldState:
    """E^{n+1} = alpha E^n + beta (curl(B/mu) - J) on the staggered mesh."""
    from .yee import _ckc_coefs, _down, _up_ckc  # Yee downward differences

    ndim = geom.ndim
    Hx = fields.Bx * medium.inv_mu
    Hy = fields.By * medium.inv_mu
    Hz = fields.Bz * medium.inv_mu
    jx, jy, jz = fields.jx, fields.jy, fields.jz
    ax_al, ay_al, az_al = medium.alpha
    ax_be, ay_be, az_be = medium.beta
    # CKC uses the same plain downward differences for E as Yee
    # (CartesianCKCAlgorithm DownwardD* are ordinary staggered differences)
    del algo
    if ndim == 3:
        idx, idy, idz = (1.0 / d for d in geom.dx)
        Ex = ax_al * fields.Ex + ax_be * (
            _down(Hz, 1, idy) - _down(Hy, 2, idz) - jx
        )
        Ey = ay_al * fields.Ey + ay_be * (
            _down(Hx, 2, idz) - _down(Hz, 0, idx) - jy
        )
        Ez = az_al * fields.Ez + az_be * (
            _down(Hy, 0, idx) - _down(Hx, 1, idy) - jz
        )
    elif ndim == 2:  # axes (x, z); d/dy = 0
        idx, idz = (1.0 / d for d in geom.dx)
        Ex = ax_al * fields.Ex + ax_be * (-_down(Hy, 1, idz) - jx)
        Ey = ay_al * fields.Ey + ay_be * (
            _down(Hx, 1, idz) - _down(Hz, 0, idx) - jy
        )
        Ez = az_al * fields.Ez + az_be * (_down(Hy, 0, idx) - jz)
    else:  # 1D (z)
        idz = 1.0 / geom.dx[0]
        Ex = ax_al * fields.Ex + ax_be * (-_down(Hy, 0, idz) - jx)
        Ey = ay_al * fields.Ey + ay_be * (_down(Hx, 0, idz) - jy)
        Ez = az_al * fields.Ez + az_be * (-jz)
    return fields.replace(Ex=Ex, Ey=Ey, Ez=Ez)
