"""Reduced diagnostics: scalar/time-series quantities + CSV writer.

Reimplements the core of the reference's ReducedDiags family
(Source/Diagnostics/ReducedDiags/): FieldEnergy, FieldMaximum, FieldMomentum,
ParticleEnergy, ParticleMomentum, ParticleNumber, ParticleExtrema,
RhoMaximum, LoadBalanceEfficiency (static-shard placeholder).  Each compute
returns a flat dict of named floats; the writer emits the reference's
CSV-with-header format (one row per step).
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..core.config import SimConfig
from ..core.state import SimState

__all__ = ["REDUCED_DIAGS", "ReducedDiagWriter", "compute_reduced"]


def field_energy(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    """Integrated field energy (ReducedDiags/FieldEnergy.cpp):
    E_E = eps0/2 int E^2 dV ; E_B = 1/(2 mu0) int B^2 dV."""
    f = state.fields
    dv = cfg.geometry.cell_volume
    e2 = sum(float(jnp.sum(a * a)) for a in (f.Ex, f.Ey, f.Ez))
    b2 = sum(float(jnp.sum(a * a)) for a in (f.Bx, f.By, f.Bz))
    ee = 0.5 * constants.ep0 * e2 * dv
    eb = 0.5 / constants.mu0 * b2 * dv
    return {"total_lev0(J)": ee + eb, "E_lev0(J)": ee, "B_lev0(J)": eb}


def field_maximum(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    f = state.fields
    out = {}
    for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        out[f"max_{nm}_lev0"] = float(jnp.max(jnp.abs(getattr(f, nm))))
    e = jnp.sqrt(f.Ex**2 + f.Ey**2 + f.Ez**2)
    out["max_|E|_lev0"] = float(jnp.max(e))
    b = jnp.sqrt(f.Bx**2 + f.By**2 + f.Bz**2)
    out["max_|B|_lev0"] = float(jnp.max(b))
    return out


def field_momentum(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    """eps0 int (E x B) dV (FieldMomentum.cpp; cell-centered approximation)."""
    from .fields import cell_center

    f = state.fields
    n_cell = cfg.geometry.n_cell
    cc = {
        nm: cell_center(getattr(f, nm), staggering[nm], n_cell)
        for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
    }
    dv = cfg.geometry.cell_volume
    px = float(jnp.sum(cc["Ey"] * cc["Bz"] - cc["Ez"] * cc["By"]))
    py = float(jnp.sum(cc["Ez"] * cc["Bx"] - cc["Ex"] * cc["Bz"]))
    pz = float(jnp.sum(cc["Ex"] * cc["By"] - cc["Ey"] * cc["Bx"]))
    k = constants.ep0 * dv
    return {
        "momentum_x_lev0(kg*m/s)": k * px,
        "momentum_y_lev0(kg*m/s)": k * py,
        "momentum_z_lev0(kg*m/s)": k * pz,
    }


def _species_iter(state: SimState, cfg: SimConfig):
    for sp_cfg in cfg.species:
        if sp_cfg.injection_style == "laser":
            continue
        sp = state.species[sp_cfg.name]
        if sp.capacity == 0:
            continue
        yield sp_cfg, sp


def particle_energy(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    """Sum of w m c^2 (gamma - 1) per species (ParticleEnergy.cpp)."""
    out = {}
    total = 0.0
    c2 = constants.c**2
    for sp_cfg, sp in _species_iter(state, cfg):
        u2 = sp.ux**2 + sp.uy**2 + sp.uz**2
        gamma = jnp.sqrt(1.0 + u2 / c2)
        e = jnp.where(sp.alive, sp.w * sp_cfg.mass * c2 * (gamma - 1.0), 0.0)
        val = float(jnp.sum(e))
        out[f"{sp_cfg.name}(J)"] = val
        total += val
    out["total(J)"] = total
    return out


def particle_momentum(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    out = {}
    tot = [0.0, 0.0, 0.0]
    for sp_cfg, sp in _species_iter(state, cfg):
        for ax, u in (("x", sp.ux), ("y", sp.uy), ("z", sp.uz)):
            val = float(
                jnp.sum(jnp.where(sp.alive, sp.w * sp_cfg.mass * u, 0.0))
            )
            out[f"{sp_cfg.name}_momentum_{ax}(kg*m/s)"] = val
            tot["xyz".index(ax)] += val
    for i, ax in enumerate("xyz"):
        out[f"total_momentum_{ax}(kg*m/s)"] = tot[i]
    return out


def particle_number(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    out = {}
    total = 0.0
    total_w = 0.0
    for sp_cfg, sp in _species_iter(state, cfg):
        n = float(jnp.sum(sp.alive))
        w = float(jnp.sum(jnp.where(sp.alive, sp.w, 0.0)))
        out[f"{sp_cfg.name}_macroparticles()"] = n
        out[f"{sp_cfg.name}_weight()"] = w
        total += n
        total_w += w
    out["total_macroparticles()"] = total
    out["total_weight()"] = total_w
    return out


def particle_extrema(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    out = {}
    big = 1e300
    for sp_cfg, sp in _species_iter(state, cfg):
        pos = sp.positions(cfg.geometry.ndim)
        names = {1: ["z"], 2: ["x", "z"], 3: ["x", "y", "z"]}[cfg.geometry.ndim]
        for nm, arr in list(zip(names, pos)) + [
            ("ux", sp.ux), ("uy", sp.uy), ("uz", sp.uz), ("w", sp.w)
        ]:
            lo = float(jnp.min(jnp.where(sp.alive, arr, big)))
            hi = float(jnp.max(jnp.where(sp.alive, arr, -big)))
            out[f"{sp_cfg.name}_{nm}min"] = lo
            out[f"{sp_cfg.name}_{nm}max"] = hi
    return out


def rho_maximum(state: SimState, cfg: SimConfig, staggering) -> Dict[str, float]:
    from .fields import deposit_total_rho

    rho = deposit_total_rho(state, cfg)
    return {
        "max_rho_lev0(C/m^3)": float(jnp.max(rho)),
        "min_rho_lev0(C/m^3)": float(jnp.min(rho)),
    }


def load_balance_efficiency(state, cfg, staggering) -> Dict[str, float]:
    """Static-shard placeholder: per-shard particle-count balance
    (the reference's cost-based metric, WarpXRegrid.cpp:104-124)."""
    counts = []
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity:
            counts.append(float(jnp.sum(sp.alive)))
    total = sum(counts) or 1.0
    return {"lev0_efficiency()": 1.0 if total else 1.0}


REDUCED_DIAGS = {
    "FieldEnergy": field_energy,
    "FieldMaximum": field_maximum,
    "FieldMomentum": field_momentum,
    "ParticleEnergy": particle_energy,
    "ParticleMomentum": particle_momentum,
    "ParticleNumber": particle_number,
    "ParticleExtrema": particle_extrema,
    "RhoMaximum": rho_maximum,
    "LoadBalanceEfficiency": load_balance_efficiency,
}


def compute_reduced(kind: str, state, cfg, staggering) -> Dict[str, float]:
    return REDUCED_DIAGS[kind](state, cfg, staggering)


class ReducedDiagWriter:
    """CSV time-series writer in the reference's ReducedDiags format
    (header row of '#', then step, time, columns)."""

    def __init__(self, path: str, name: str, kind: str):
        self.path = os.path.join(path, f"{name}.txt")
        self.kind = kind
        self._wrote_header = False
        os.makedirs(path, exist_ok=True)

    def write(self, step: int, time: float, values: Dict[str, float]):
        if not self._wrote_header:
            cols = ["step()", "time(s)"] + list(values.keys())
            header = "#" + ",".join(
                f"[{i}]{c}" for i, c in enumerate(cols)
            )
            with open(self.path, "w") as fh:
                fh.write(header + "\n")
            self._wrote_header = True
        row = [str(step), repr(time)] + [repr(v) for v in values.values()]
        with open(self.path, "a") as fh:
            fh.write(",".join(row) + "\n")
