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
        # stable (gamma-1)*(gamma+1)/(gamma+1) form, exact for cold
        # particles (Particles/Algorithms/KineticEnergy.H:44-47)
        e = jnp.where(sp.alive, sp.w * sp_cfg.mass * u2 / (1.0 + gamma), 0.0)
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


def beam_relevant(state, cfg, staggering, params) -> Dict[str, float]:
    """Weighted beam moments (reference: BeamRelevant.cpp:40-300): means of
    position/momentum, gamma, rms sizes, normalized emittances, charge."""
    import numpy as np

    from .. import constants as _cst

    name = params["species"]
    sp_cfg = next(s for s in cfg.species if s.name == name)
    sp = state.species[name]
    alive = np.asarray(sp.alive)
    w = np.asarray(sp.w)[alive]
    wsum = w.sum() or 1.0
    ndim = cfg.geometry.ndim
    pos = [np.asarray(p)[alive] for p in sp.positions(ndim)]
    xyz = {1: {"z": 0}, 2: {"x": 0, "z": 1}, 3: {"x": 0, "y": 1, "z": 2}}[ndim]
    m = sp_cfg.mass
    u = {c: np.asarray(getattr(sp, "u" + c))[alive] for c in "xyz"}
    gam = np.sqrt(1 + (u["x"]**2 + u["y"]**2 + u["z"]**2) / _cst.c**2)
    out = {}
    for c in "xyz":
        if c in xyz:
            out[f"{c}_mean(m)"] = float((w * pos[xyz[c]]).sum() / wsum)
    for c in "xyz":
        out[f"p{c}_mean(kg*m/s)"] = float((w * m * u[c]).sum() / wsum)
    out["gamma_mean()"] = float((w * gam).sum() / wsum)
    for c in "xyz":
        if c in xyz:
            d = pos[xyz[c]] - out[f"{c}_mean(m)"]
            out[f"{c}_rms(m)"] = float(np.sqrt((w * d * d).sum() / wsum))
    for c in "xyz":
        p = m * u[c] - out[f"p{c}_mean(kg*m/s)"]
        out[f"p{c}_rms(kg*m/s)"] = float(np.sqrt((w * p * p).sum() / wsum))
    out["gamma_rms()"] = float(
        np.sqrt((w * (gam - out["gamma_mean()"]) ** 2).sum() / wsum)
    )
    for c in "xyz":
        if c in xyz:
            d = pos[xyz[c]] - out[f"{c}_mean(m)"]
            p = m * u[c] - out[f"p{c}_mean(kg*m/s)"]
            x2 = (w * d * d).sum() / wsum
            p2 = (w * p * p).sum() / wsum
            xp = (w * d * p).sum() / wsum
            out[f"emittance_{c}(m)"] = float(
                np.sqrt(max(x2 * p2 - xp * xp, 0.0)) / (m * _cst.c)
            )
    out["charge(C)"] = float(sp_cfg.charge * wsum if w.size else 0.0)
    return out


def particle_histogram(state, cfg, staggering, params) -> Dict[str, float]:
    """Weighted histogram of a parsed particle function
    (reference: ParticleHistogram.cpp; function of (t,x,y,z,ux,uy,uz) with
    optional filter, ux in units of c)."""
    import numpy as np

    from .. import constants as _cst
    from ..utils.expression import compile_expression

    name = params["species"]
    sp = state.species[name]
    alive = np.asarray(sp.alive)
    w = np.asarray(sp.w)[alive]
    ndim = cfg.geometry.ndim
    pos = [np.asarray(p)[alive] for p in sp.positions(ndim)]
    xyz = [np.zeros_like(w)] * 3
    act = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    for d, a in enumerate(act):
        xyz[a] = pos[d]
    u = [np.asarray(getattr(sp, "u" + c))[alive] / _cst.c for c in "xyz"]
    t = float(state.time)
    args = [t, xyz[0], xyz[1], xyz[2], u[0], u[1], u[2]]
    fn = compile_expression(
        params["histogram_function"], ("t", "x", "y", "z", "ux", "uy", "uz")
    )
    vals = np.asarray(fn(*args))
    if params.get("filter_function"):
        ffn = compile_expression(
            params["filter_function"], ("t", "x", "y", "z", "ux", "uy", "uz")
        )
        keep = np.asarray(ffn(*args)) > 0
        vals, w = vals[keep], w[keep]
    nbin = int(params.get("bin_number", 10))
    lo = float(params.get("bin_min", 0.0))
    hi = float(params.get("bin_max", 1.0))
    hist, _ = np.histogram(vals, bins=nbin, range=(lo, hi), weights=w)
    if params.get("normalization") == "unity_particle_weight":
        hist2, _ = np.histogram(vals, bins=nbin, range=(lo, hi))
        hist = hist2.astype(float)
    return {f"bin{i+1}()": float(hist[i]) for i in range(nbin)}


def field_probe(state, cfg, staggering, params) -> Dict[str, float]:
    """Point probe of the cell-centered E/B (reference: FieldProbe.cpp,
    probe_geometry=Point; interpolation from the cell-centered output)."""
    import numpy as np

    from .fields import cell_centered_output, current_origin

    out_fields = cell_centered_output(state, cfg, staggering)
    geom = cfg.geometry
    origin = current_origin(state, cfg)
    act = {1: ("z",), 2: ("x", "z"), 3: ("x", "y", "z")}[geom.ndim]
    idx = []
    for d, c in enumerate(act):
        p = float(params.get(f"{c}_probe", 0.0))
        i = (p - origin[d]) / geom.dx[d] - 0.5
        idx.append(int(np.clip(round(i), 0, geom.n_cell[d] - 1)))
    out = {}
    for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        out[f"part_{nm}_lev0-(V/m)" if nm[0] == "E" else f"part_{nm}_lev0-(T)"] = float(
            out_fields[nm][tuple(idx)]
        )
    e2 = sum(out_fields[n][tuple(idx)] ** 2 for n in ("Ex", "Ey", "Ez"))
    out["part_S_lev0-(W/m^2)"] = float(e2) ** 0.5  # |E| magnitude proxy
    return out


def field_reduction(state, cfg, staggering, params) -> Dict[str, float]:
    """Parsed reduction over the cell-centered fields (reference:
    FieldReduction.cpp; reduced_function(x,y,z,Ex..Bz[,jx..jz]),
    reduction_type Maximum|Minimum|Integral)."""
    import numpy as np

    from ..utils.expression import compile_expression
    from .fields import cell_centered_output, current_origin

    fields = cell_centered_output(state, cfg, staggering)
    geom = cfg.geometry
    origin = current_origin(state, cfg)
    coords = [
        origin[d] + (np.arange(geom.n_cell[d]) + 0.5) * geom.dx[d]
        for d in range(geom.ndim)
    ]
    mesh = np.meshgrid(*coords, indexing="ij")
    xyz = [np.zeros(geom.n_cell)] * 3
    act = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[geom.ndim]
    for d, a in enumerate(act):
        xyz[a] = mesh[d]
    names = ("Ex", "Ey", "Ez", "Bx", "By", "Bz", "jx", "jy", "jz")
    fn = compile_expression(
        params["reduced_function"], ("x", "y", "z") + names
    )
    vals = np.asarray(fn(*xyz, *[fields[n] for n in names]))
    rt = (params.get("reduction_type") or "Maximum").lower()
    if rt == "maximum":
        v = float(np.max(vals))
    elif rt == "minimum":
        v = float(np.min(vals))
    else:  # integral
        v = float(np.sum(vals) * geom.cell_volume)
    return {"value()": v}




def timestep(state, cfg, staggering) -> "Dict[str, float]":
    """Current simulation dt (ReducedDiags/Timestep.cpp)."""
    return {"timestep_lev0(s)": float(cfg.dt)}


def particle_histogram2d(state, cfg, staggering, params) -> "Dict[str, float]":
    """2D weighted histogram of two parsed particle functions
    (reference: ParticleHistogram2D.cpp; abscissa/ordinate functions of
    (t,x,y,z,ux,uy,uz,w), value written row-major bin(i,j))."""
    import numpy as np

    from .. import constants as _cst
    from ..utils.expression import compile_expression

    name = params["species"]
    sp = state.species[name]
    alive = np.asarray(sp.alive)
    w = np.asarray(sp.w)[alive]
    ndim = cfg.geometry.ndim
    pos = [np.asarray(p)[alive] for p in sp.positions(ndim)]
    xyz = [np.zeros_like(w)] * 3
    act = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    for d, a in enumerate(act):
        xyz[a] = pos[d]
    u = [np.asarray(getattr(sp, "u" + c))[alive] / _cst.c for c in "xyz"]
    t = float(state.time)
    args = [t, xyz[0], xyz[1], xyz[2], u[0], u[1], u[2], w]
    vnames = ("t", "x", "y", "z", "ux", "uy", "uz", "w")
    fa = compile_expression(params["histogram_function_abscissa"], vnames)
    fo = compile_expression(params["histogram_function_ordinate"], vnames)
    va = np.asarray(fa(*args))
    vo = np.asarray(fo(*args))
    wv = w.copy()
    if params.get("value_function"):
        vfn = compile_expression(params["value_function"], vnames)
        wv = w * np.broadcast_to(np.asarray(vfn(*args)), w.shape)
    if params.get("filter_function"):
        ffn = compile_expression(params["filter_function"], vnames)
        keep = np.asarray(ffn(*args)) > 0
        va, vo, wv = va[keep], vo[keep], wv[keep]
    na = int(params.get("bin_number_abs", 10))
    no = int(params.get("bin_number_ord", 10))
    hist, _, _ = np.histogram2d(
        va, vo, bins=(na, no),
        range=((float(params.get("bin_min_abs", 0.0)),
                float(params.get("bin_max_abs", 1.0))),
               (float(params.get("bin_min_ord", 0.0)),
                float(params.get("bin_max_ord", 1.0)))),
        weights=wv,
    )
    return {
        f"bin({i},{j})": float(hist[i, j])
        for i in range(na) for j in range(no)
    }


REDUCED_DIAGS = {
    "BeamRelevant": beam_relevant,
    "ParticleHistogram": particle_histogram,
    "FieldProbe": field_probe,
    "FieldReduction": field_reduction,
    "FieldEnergy": field_energy,
    "FieldMaximum": field_maximum,
    "FieldMomentum": field_momentum,
    "ParticleEnergy": particle_energy,
    "ParticleMomentum": particle_momentum,
    "ParticleNumber": particle_number,
    "ParticleExtrema": particle_extrema,
    "RhoMaximum": rho_maximum,
    "LoadBalanceEfficiency": load_balance_efficiency,
    "Timestep": timestep,
    "ParticleHistogram2D": particle_histogram2d,
}


_PARAM_KINDS = {
    "BeamRelevant", "ParticleHistogram", "FieldProbe", "FieldReduction",
    "ParticleHistogram2D",
}


def compute_reduced(
    kind: str, state, cfg, staggering, params=None
) -> Dict[str, float]:
    if kind in _PARAM_KINDS:
        return REDUCED_DIAGS[kind](state, cfg, staggering, params or {})
    return REDUCED_DIAGS[kind](state, cfg, staggering)


