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

import jax
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
    """Average-over-max per-chip cost of the CURRENT distribution mapping
    (amrex ComputeDistributionMappingEfficiency semantics, reported by
    LoadBalanceEfficiency.cpp:44).  Multi-chip runs keep the live value in
    aux['lb_efficiency'] (written by DistSimulation.load_balance); a
    single-chip run is trivially balanced."""
    eff = state.aux.get("lb_efficiency")
    return {"lev0_efficiency()": float(eff) if eff is not None else 1.0}


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


def _deposit_number_density(state, cfg, name):
    """Cell-centered number density of one species (CIC, like the
    reference's GetChargeDensity/|q| + Coarsen in ColliderRelevant)."""
    from ..ops.deposit import deposit_rho

    geom = cfg.geometry
    sp = state.species[name]
    w_eff = jnp.where(sp.alive, sp.w, 0.0)
    rho = deposit_rho(
        sp.positions(geom.ndim), w_eff, 1.0, geom, cfg.particle_shape,
    )
    return rho  # weight density [m^-3] (charge set to 1)


def collider_relevant(state, cfg, staggering, params) -> Dict[str, float]:
    """ColliderRelevant.cpp: dL_dt = 2 c sum_cells n1 n2 dV plus per-beam
    transverse position/angle statistics (and chi when QED is active)."""
    from .. import constants as _k

    beams = params.get("species", [])
    if isinstance(beams, str):
        beams = beams.split()
    if len(beams) != 2:
        raise ValueError("ColliderRelevant needs exactly 2 species")
    geom = cfg.geometry
    n1 = _deposit_number_density(state, cfg, beams[0])
    n2 = _deposit_number_density(state, cfg, beams[1])
    out = {
        "dL_dt": float(
            2.0 * _k.c * jnp.sum(n1 * n2) * geom.cell_volume
        )
    }
    by_name = {s.name: s for s in cfg.species}
    for nm in beams:
        sp = state.species[nm]
        alive = sp.alive
        w = jnp.where(alive, sp.w, 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-300)

        def wavg(a):
            return jnp.sum(w * a) / wsum

        if sp.x is not None:
            xa = wavg(sp.x)
            out[f"x_ave_{nm}"] = float(xa)
            out[f"x_std_{nm}"] = float(
                jnp.sqrt(jnp.maximum(wavg((sp.x - xa) ** 2), 0.0))
            )
        if sp.y is not None:
            ya = wavg(sp.y)
            out[f"y_ave_{nm}"] = float(ya)
            out[f"y_std_{nm}"] = float(
                jnp.sqrt(jnp.maximum(wavg((sp.y - ya) ** 2), 0.0))
            )
        safe_uz = jnp.where(sp.uz == 0, 1.0, sp.uz)
        pairs = [("thetax", sp.ux)]
        if geom.ndim == 3:
            pairs.append(("thetay", sp.uy))
        for lbl, u_t in pairs:
            th = jnp.arctan2(u_t, safe_uz)
            tha = wavg(th)
            big = jnp.where(alive, th, jnp.inf)
            small = jnp.where(alive, th, -jnp.inf)
            out[f"{lbl}_min_{nm}"] = float(jnp.min(big))
            out[f"{lbl}_ave_{nm}"] = float(tha)
            out[f"{lbl}_max_{nm}"] = float(jnp.max(small))
            out[f"{lbl}_std_{nm}"] = float(
                jnp.sqrt(jnp.maximum(wavg((th - tha) ** 2), 0.0))
            )
        sp_cfg = by_name[nm]
        if sp_cfg.do_qed_quantum_sync or sp_cfg.do_qed_breit_wheeler:
            from ..ops.qed import particle_chi

            farr = {
                "Ex": state.fields.Ex, "Ey": state.fields.Ey,
                "Ez": state.fields.Ez, "Bx": state.fields.Bx,
                "By": state.fields.By, "Bz": state.fields.Bz,
            }
            from ..ops.gather import gather_eb

            e6 = gather_eb(
                sp.positions(geom.ndim), farr, staggering, geom,
                cfg.particle_shape, cfg.galerkin,
            )
            chi = particle_chi(sp.ux, sp.uy, sp.uz, *e6)
            out[f"chimin_{nm}"] = float(
                jnp.min(jnp.where(alive, chi, jnp.inf)))
            out[f"chiave_{nm}"] = float(wavg(chi))
            out[f"chimax_{nm}"] = float(
                jnp.max(jnp.where(alive, chi, -jnp.inf)))
    return out


def differential_luminosity(state, cfg, staggering, params) -> Dict[str, float]:
    """DifferentialLuminosity.cpp: d^2L/(dE_com dt) histogram, accumulated
    per step into state.aux['dluminosity:<name>'].

    The reference loops ALL same-cell pairs; here pairs are sampled with the
    strided in-cell pairing of the collision machinery (each of max(N1,N2)
    pairs carries the min(N1,N2) multiplicity) — an unbiased estimator of
    the same integral at bounded cost.
    """
    from .. import constants as _k
    from ..ops.collisions import _cell_of

    beams = params.get("species", [])
    if isinstance(beams, str):
        beams = beams.split()
    nbin = int(params.get("bin_number", 100))
    bmin = float(params.get("bin_min", 0.0))
    bmax = float(params.get("bin_max", 1.0))
    bsize = (bmax - bmin) / nbin
    geom = cfg.geometry
    by_name = {s.name: s for s in cfg.species}
    sp1 = state.species[beams[0]]
    sp2 = state.species[beams[1]]
    c1, c2 = by_name[beams[0]], by_name[beams[1]]
    m_e = 9.1093837015e-31
    n_cells_tot = 1
    for d in range(geom.ndim):
        n_cells_tot *= geom.n_cell[d]
    cell1 = _cell_of(sp1, geom, n_cells_tot)
    cell2 = _cell_of(sp2, geom, n_cells_tot)
    key = jax.random.PRNGKey(int(state.step))
    o1 = jnp.lexsort((jax.random.uniform(key, (sp1.capacity,)), cell1))
    o2 = jnp.lexsort((jax.random.uniform(
        jax.random.fold_in(key, 1), (sp2.capacity,)), cell2))
    counts1 = jnp.zeros(n_cells_tot + 1, jnp.int32).at[cell1].add(
        jnp.where(sp1.alive, 1, 0))
    counts2 = jnp.zeros(n_cells_tot + 1, jnp.int32).at[cell2].add(
        jnp.where(sp2.alive, 1, 0))
    starts1 = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts1)[:-1].astype(jnp.int32)])
    starts2 = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts2)[:-1].astype(jnp.int32)])
    j = jnp.arange(sp1.capacity)
    cL = cell1[o1]
    rank = j - starts1[jnp.clip(cL, 0, n_cells_tot)]
    N2c = counts2[jnp.clip(cL, 0, n_cells_tot)]
    ok = sp1.alive[o1] & (cL < n_cells_tot) & (N2c > 0)
    slot2 = jnp.clip(
        starts2[jnp.clip(cL, 0, n_cells_tot)]
        + rank % jnp.maximum(N2c, 1), 0, sp2.capacity - 1)
    i1 = o1
    i2 = o2[slot2]
    ok = ok & sp2.alive[i2]
    mult = jnp.minimum(counts1, counts2)[jnp.clip(cL, 0, n_cells_tot)]

    def four_mom(sp, c, idx):
        u_sq = sp.ux[idx]**2 + sp.uy[idx]**2 + sp.uz[idx]**2
        if c.species_type == "photon":
            pt = m_e * jnp.sqrt(u_sq)
            m = 0.0
        else:
            pt = c.mass * jnp.sqrt(_k.c**2 + u_sq)
            m = c.mass
        return pt, c.mass * sp.ux[idx], c.mass * sp.uy[idx], \
            c.mass * sp.uz[idx], m

    p1t, p1x, p1y, p1z, m1 = four_mom(sp1, c1, i1)
    p2t, p2x, p2y, p2z, m2 = four_mom(sp2, c2, i2)
    E_com = (_k.c / _k.q_e) * jnp.sqrt(jnp.maximum(
        m1 * m1 * _k.c**2 + m2 * m2 * _k.c**2
        + 2 * (p1t * p2t - p1x * p2x - p1y * p2y - p1z * p2z), 0.0))
    ip1 = 1.0 / jnp.maximum(p1t, 1e-300)
    ip2 = 1.0 / jnp.maximum(p2t, 1e-300)
    b1sq = (p1x**2 + p1y**2 + p1z**2) * ip1 * ip1
    b2sq = (p2x**2 + p2y**2 + p2z**2) * ip2 * ip2
    b12 = (p1x * p2x + p1y * p2y + p1z * p2z) * ip1 * ip2
    radicand = jnp.maximum(b1sq + b2sq - 2 * b12 - b1sq * b2sq + b12**2, 0.0)
    w1 = sp1.w[i1]
    w2 = sp2.w[i2]
    val = (_k.c * jnp.sqrt(radicand) * w1 * w2
           * mult.astype(w1.dtype)
           / geom.cell_volume / bsize * cfg.dt)
    bins = jnp.floor((E_com - bmin) / bsize).astype(jnp.int32)
    inb = ok & (bins >= 0) & (bins < nbin)
    hist = jnp.zeros(nbin).at[jnp.where(inb, bins, 0)].add(
        jnp.where(inb, val, 0.0))
    # accumulate across steps like the reference's d_data
    key_aux = "dluminosity:" + "_".join(beams)
    prev = state.aux.get(key_aux)
    if prev is not None:
        hist = hist + prev
    state.aux[key_aux] = hist  # caller persists aux mutation by convention
    return {
        f"bin{i+1}={bmin + bsize * (i + 0.5):.6e}(m^-2/eV)": float(hist[i])
        for i in range(nbin)
    }


def charge_on_eb(state, cfg, staggering, params) -> Dict[str, float]:
    """ChargeOnEB.cpp: total charge inside the embedded boundary via Gauss,
    Q = eps0 * sum_covered div(E) dV (the staircase form of the reference's
    surface integral of eps0 E.n over the EB); optional weighting function
    w(x,y,z) applied per covered cell."""
    from .. import constants as _k
    from ..solvers.yee import compute_div_e
    from ..utils.expression import compile_expression

    if not cfg.eb_implicit_function:
        raise ValueError("ChargeOnEB requires an embedded boundary")
    geom = cfg.geometry
    bcl = cfg.field_bc_lo or ("periodic",) * geom.ndim
    if all(b == "periodic" for b in bcl):
        dive = compute_div_e(state.fields, geom)
    else:
        # bounded staggered shapes (nodal dims hold n+1 wall-inclusive
        # values): exact one-sided differences with a zero exterior,
        # cell-centered onto the covered-cell mask below
        from .fields import cell_center

        dive = None
        for d, axn in enumerate(geom.axis_names):
            e_arr = getattr(state.fields, "E" + axn)
            if bcl[d] != "periodic":
                pad = [(0, 0)] * geom.ndim
                pad[d] = (1, 1)
                te = jnp.diff(jnp.pad(e_arr, pad), axis=d) / geom.dx[d]
            else:
                te = (e_arr - jnp.roll(e_arr, 1, axis=d)) / geom.dx[d]
            dive = te if dive is None else dive + te
        dive = cell_center(dive, (1,) * geom.ndim, geom.n_cell)
    fn = compile_expression(
        cfg.eb_implicit_function, ("x", "y", "z"),
        dict(cfg.user_constants or ()),
    )
    axes3 = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[geom.ndim]
    coords = [geom.cell_centers(d) for d in range(geom.ndim)]
    mesh = jnp.meshgrid(*[jnp.asarray(cc) for cc in coords], indexing="ij")
    xyz = [jnp.zeros_like(mesh[0])] * 3
    for d in range(geom.ndim):
        xyz[axes3[d]] = mesh[d]
    covered = fn(*xyz) > 0.0
    weight = 1.0
    wexpr = params.get("weighting_function", "")
    if wexpr:
        weight = compile_expression(
            wexpr, ("x", "y", "z"), dict(cfg.user_constants or ())
        )(*xyz)
    q = _k.ep0 * jnp.sum(
        jnp.where(covered, dive[: covered.shape[0]] if
                  dive.shape != covered.shape else dive, 0.0) * weight
    ) * geom.cell_volume
    return {"Charge (C)": float(q)}


def load_balance_costs(state, cfg, staggering) -> Dict[str, float]:
    """LoadBalanceCosts.cpp: per-device heuristic cost
    (costs_heuristic_particles_wt * n_particles +
    costs_heuristic_cells_wt * n_cells; reference WarpXRegrid.cpp:316).
    Single-chip runs report one box; sharded runs report per-shard costs
    via the parallel.distribute machinery."""
    n_parts = 0.0
    for nm, sp in state.species.items():
        n_parts += float(jnp.sum(sp.alive))
    n_cells = 1.0
    for n in cfg.geometry.n_cell:
        n_cells *= n
    part_wt, cell_wt = 0.9, 0.1  # reference GPU defaults (WarpX.cpp)
    cost = part_wt * n_parts + cell_wt * n_cells
    return {
        "cost_box_0": cost,
        "proc_box_0": 0.0,
        "lev_box_0": 0.0,
        "i_low_box_0": 0.0,
        "num_cells_box_0": n_cells,
        "num_macro_particles_box_0": n_parts,
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
    "ColliderRelevant": collider_relevant,
    "DifferentialLuminosity": differential_luminosity,
    "ChargeOnEB": charge_on_eb,
    "LoadBalanceCosts": load_balance_costs,
}


_PARAM_KINDS = {
    "BeamRelevant", "ParticleHistogram", "FieldProbe", "FieldReduction",
    "ParticleHistogram2D", "ColliderRelevant", "DifferentialLuminosity",
    "ChargeOnEB",
}


def compute_reduced(
    kind: str, state, cfg, staggering, params=None
) -> Dict[str, float]:
    if kind in _PARAM_KINDS:
        return REDUCED_DIAGS[kind](state, cfg, staggering, params or {})
    return REDUCED_DIAGS[kind](state, cfg, staggering)


