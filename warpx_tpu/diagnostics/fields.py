"""Field diagnostics: cell-centered output arrays.

The reference's full diagnostics interpolate every staggered field to cell
centers before writing (CellCenterFunctor -> ablastr::coarsen::sample::Interp,
reference: Source/ablastr/coarsen/sample.H: for an un-coarsened output the
value at cell i is the average over the 2 surrounding points in every nodal
dimension and the identity in cell-centered dimensions).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..core.config import SimConfig
from ..core.state import SimState
from ..ops.deposit import count_particles_per_cell, deposit_rho

__all__ = ["cell_center", "cell_centered_output", "deposit_total_rho"]


def cell_center(arr: jnp.ndarray, nodal_flags) -> jnp.ndarray:
    """Average to cell centers on the periodic torus."""
    out = arr
    for d, flag in enumerate(nodal_flags):
        if flag == 1:
            out = 0.5 * (out + jnp.roll(out, -1, axis=d))
    return out


def deposit_total_rho(state: SimState, cfg: SimConfig) -> jnp.ndarray:
    """Nodal charge density summed over species at current positions
    (reference: RhoFunctor -> GetChargeDensity)."""
    geom = cfg.geometry
    rho = jnp.zeros(geom.n_cell, dtype=state.fields.Ex.dtype)
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity == 0 or sp_cfg.do_not_deposit:
            continue
        w_eff = jnp.where(sp.alive, sp.w, 0.0)
        rho = deposit_rho(
            sp.positions(geom.ndim), w_eff, sp_cfg.charge, geom,
            cfg.particle_shape, out=rho,
        )
    return rho


def cell_centered_output(
    state: SimState, cfg: SimConfig, staggering: Dict
) -> Dict[str, np.ndarray]:
    f = state.fields
    out = {}
    for name, arr in (
        ("Ex", f.Ex), ("Ey", f.Ey), ("Ez", f.Ez),
        ("Bx", f.Bx), ("By", f.By), ("Bz", f.Bz),
        ("jx", f.jx), ("jy", f.jy), ("jz", f.jz),
    ):
        out[name] = np.asarray(cell_center(arr, staggering[name]))

    geom = cfg.geometry
    rho = deposit_total_rho(state, cfg)
    out["rho"] = np.asarray(cell_center(rho, staggering["rho"]))

    ppc = jnp.zeros(geom.n_cell, dtype=f.Ex.dtype)
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity:
            ppc = ppc + count_particles_per_cell(
                sp.positions(geom.ndim), sp.alive, geom
            )
    out["part_per_cell"] = np.asarray(ppc)
    return out
