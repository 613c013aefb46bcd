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


def cell_center(arr: jnp.ndarray, nodal_flags, n_cell=None) -> jnp.ndarray:
    """Average nodal dims to cell centers.

    A nodal dim stored with n+1 values (bounded domain, wall nodes included)
    averages adjacent nodes directly; a nodal dim stored with n values is a
    periodic torus and wraps.
    """
    out = arr
    for d, flag in enumerate(nodal_flags):
        if flag != 1:
            continue
        if n_cell is not None and out.shape[d] == n_cell[d] + 1:
            lo = [slice(None)] * out.ndim
            hi = [slice(None)] * out.ndim
            lo[d] = slice(0, -1)
            hi[d] = slice(1, None)
            out = 0.5 * (out[tuple(lo)] + out[tuple(hi)])
        else:
            out = 0.5 * (out + jnp.roll(out, -1, axis=d))
    return out


def current_origin(state: SimState, cfg: SimConfig):
    """Physical coordinate of array index 0 per dim (moving window aware)."""
    origin = list(cfg.geometry.prob_lo)
    if cfg.do_moving_window and "window_lo" in state.aux:
        # may be a traced scalar when called under jit (e.g. ES solve with a
        # moving window) — keep it symbolic, downstream arithmetic is traceable
        origin[cfg.moving_window_dir] = state.aux["window_lo"]
    return origin


def deposit_total_rho(
    state: SimState, cfg: SimConfig, only=None
) -> jnp.ndarray:
    """Nodal charge density summed over species at current positions
    (reference: RhoFunctor -> GetChargeDensity over all containers incl.
    lasers, then ApplyFilterandSumBoundaryRho: filter with guards, fold
    periodic guards, drop non-periodic guards — WarpXComm.cpp:1552)."""
    geom = cfg.geometry
    ndim = geom.ndim
    origin = current_origin(state, cfg)
    bc_lo = cfg.field_bc_lo or ("periodic",) * ndim
    all_periodic = all(bc == "periodic" for bc in bc_lo)

    # MR: particles deep inside the fine patch live on level 1 (reference:
    # per-level particle storage), so the level-0 diag rho EXCLUDES them
    # (GetChargeDensity(0) deposits level-0 particles only); the lev=1
    # covering-grid rho picks them up (core/mr.py mr_output_fields)
    patch_excl = None
    if cfg.max_level > 0 and not getattr(cfg.geometry, "rz", False):
        from ..core.grid import collocated_staggering, yee_staggering
        from ..core.mr import MRLayout

        stag = (collocated_staggering(ndim)
                if cfg.grid_type == "collocated" else yee_staggering(ndim))
        lay = MRLayout(cfg, stag)
        if not lay.full_domain:
            patch_lo_dyn = list(lay.patch_lo)
            if cfg.do_moving_window and "window_lo" in state.aux:
                wd = cfg.moving_window_dir
                patch_lo_dyn[wd] = patch_lo_dyn[wd] + (
                    state.aux["window_lo"] - geom.prob_lo[wd]
                )

            def patch_excl(pos):
                m = None
                for d in range(ndim):
                    if lay.spanning[d]:
                        continue
                    idx = jnp.floor(
                        (pos[d] - patch_lo_dyn[d]) / lay.dxf[d]
                    ).astype(jnp.int32)
                    in_d = (idx >= lay.dep_buf) & (
                        idx <= lay.nf[d] - 1 - lay.dep_buf
                    )
                    m = in_d if m is None else m & in_d
                if m is None:
                    m = jnp.ones(pos[0].shape, bool)
                return m
    fluid_rho_tot = None
    if cfg.fluids and (only is None):
        from ..solvers.fluids import fluid_rho as _frho

        for fl in cfg.fluids:
            if fl.do_not_deposit:
                continue
            contrib = _frho(state.aux[f"fluid_N:{fl.name}"], fl.charge)
            fluid_rho_tot = contrib if fluid_rho_tot is None else (
                fluid_rho_tot + contrib
            )
    ng = cfg.particle_shape + 3 + (
        max(cfg.filter_npass_each_dir or (1,)) if cfg.use_filter else 0
    )
    if all_periodic and not cfg.use_filter:
        rho = jnp.zeros(geom.n_cell, dtype=state.fields.Ex.dtype)
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0 or sp_cfg.do_not_deposit:
                continue
            if only is not None and sp_cfg.name not in only:
                continue
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            if patch_excl is not None:
                w_eff = jnp.where(
                    patch_excl(sp.positions(ndim)), 0.0, w_eff
                )
            rho = deposit_rho(
                sp.positions(ndim), w_eff, sp_cfg.charge, geom,
                cfg.particle_shape, out=rho, origin=origin,
            )
        if fluid_rho_tot is not None:
            rho = rho + fluid_rho_tot
        return rho

    padded_shape = tuple(
        geom.n_cell[d] + (0 if bc_lo[d] == "periodic" else 1) + 2 * ng
        for d in range(ndim)
    )
    rho = jnp.zeros(padded_shape, dtype=state.fields.Ex.dtype)
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity == 0 or sp_cfg.do_not_deposit:
            continue
        if only is not None and sp_cfg.name not in only:
            continue
        w_eff = jnp.where(sp.alive, sp.w, 0.0)
        if patch_excl is not None:
            w_eff = jnp.where(
                patch_excl(sp.positions(ndim)), 0.0, w_eff
            )
        rho = deposit_rho(
            sp.positions(ndim), w_eff, sp_cfg.charge, geom,
            cfg.particle_shape, out=rho, origin=origin,
            wrap=False, offset=ng, out_shape=padded_shape,
        )
    if cfg.use_filter:
        from ..solvers.filter import bilinear_filter_padded

        npass = cfg.filter_npass_each_dir or (1,) * ndim
        rho = bilinear_filter_padded(rho, npass)
    # fold guards: periodic wrap-add, or PEC image fold with psign=-1 and
    # wall-node zeroing (reference: ApplyRhofieldBoundary ->
    # SetRhoOrJfieldFromPEC, WarpX_PEC.cpp:355-406 — applied after the
    # filter; verified against test_1d_laser_acceleration golden)
    for d in reversed(range(ndim)):
        n_tot = rho.shape[d]
        n = geom.n_cell[d]
        nv = n + (0 if bc_lo[d] == "periodic" else 1)

        def sl(a, b, d=d, nd=rho.ndim):
            idx = [slice(None)] * nd
            idx[d] = slice(a, b)
            return tuple(idx)

        def at(i, d=d, nd=rho.ndim):
            idx = [slice(None)] * nd
            idx[d] = i
            return tuple(idx)

        if bc_lo[d] == "periodic":
            low = rho[sl(0, ng)]
            high = rho[sl(n_tot - ng, n_tot)]
            valid = rho[sl(ng, n_tot - ng)]
            valid = valid.at[sl(nv - ng, nv)].add(low)
            valid = valid.at[sl(0, ng)].add(high)
            rho = valid
        else:
            for k in range(1, ng + 1):
                rho = rho.at[at(ng + n - k)].add(-rho[at(ng + n + k)])
                rho = rho.at[at(ng + k)].add(-rho[at(ng - k)])
            rho = rho.at[at(ng + n)].set(0.0)
            rho = rho.at[at(ng)].set(0.0)
            rho = rho[sl(ng, ng + nv)]
    if fluid_rho_tot is not None and rho.shape == fluid_rho_tot.shape:
        rho = rho + fluid_rho_tot
    return rho


def _nodal_aux_bounded(f, staggering, cfg):
    """Nodal-averaged aux fields for momentum-conserving diagnostics, aware
    of bounded dims: the wall value of a staggered component averages with a
    ZERO guard (UpdateAuxilaryDataStagToNodal reads unfilled-zero guards
    outside non-periodic walls in the ES path), i.e. half the edge value —
    verified bit-exact against test_3d_electrostatic_sphere golden E sums."""
    ndim = cfg.geometry.ndim
    bc_lo = cfg.field_bc_lo or ("periodic",) * ndim
    orders = cfg.field_centering_no or (2,) * ndim
    out = {}
    for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        a = getattr(f, name)
        for d, flag in enumerate(staggering[name]):
            if flag != 0:
                continue
            if bc_lo[d] == "periodic":
                if orders[d] > 2:
                    from ..core.step import fornberg_centering_coeffs

                    cc_ = fornberg_centering_coeffs(orders[d])
                    acc = 0.0
                    for jj, cj in enumerate(cc_):
                        acc = acc + 0.5 * cj * (
                            jnp.roll(a, -jj, axis=d)
                            + jnp.roll(a, jj + 1, axis=d)
                        )
                    a = acc
                else:
                    a = 0.5 * (a + jnp.roll(a, 1, axis=d))
            else:
                lo = [slice(None)] * a.ndim
                hi = [slice(None)] * a.ndim
                lo[d] = slice(0, -1)
                hi[d] = slice(1, None)
                core = 0.5 * (a[tuple(lo)] + a[tuple(hi)])
                first = [slice(None)] * a.ndim
                first[d] = slice(0, 1)
                last = [slice(None)] * a.ndim
                last[d] = slice(a.shape[d] - 1, a.shape[d])
                a = jnp.concatenate(
                    [0.5 * a[tuple(first)], core, 0.5 * a[tuple(last)]],
                    axis=d,
                )
        out[name] = a
    return out


def _phys_crop(cfg, staggering):
    """Per-component slices of the physical region (drops PML strips)."""
    from ..core.domain import DomainLayout

    layout = DomainLayout.from_config(cfg)
    if not layout.has_ext:
        return None
    return {
        name: layout.phys_slice(flags) for name, flags in staggering.items()
    }


_CC_CACHE: Dict = {}


def cell_centered_output(
    state: SimState, cfg: SimConfig, staggering: Dict, psatd=None
) -> Dict[str, np.ndarray]:
    """Jit-compiled per configuration: the diagnostic pipeline (cell
    centering, fresh rho/J deposits, divE/divB, part_per_cell) runs as ONE
    compiled program instead of thousands of eager dispatches — this was
    ~2 minutes per flush on multi-million-particle decks (the QED sweep
    TIMEOUT family) before compilation."""
    import functools

    import jax

    key = (id(cfg), id(staggering), id(psatd))
    entry = _CC_CACHE.get(key)
    if entry is None or entry[1] is not cfg:
        fn = jax.jit(functools.partial(
            _cell_centered_device, cfg=cfg, staggering=staggering,
            psatd=psatd,
        ))
        entry = (fn, cfg, staggering, psatd)
        _CC_CACHE[key] = entry
    dev = entry[0](state)
    return {k: np.asarray(v) for k, v in dev.items()}


def _cell_centered_device(
    state: SimState, cfg: SimConfig, staggering: Dict, psatd=None
) -> Dict[str, np.ndarray]:
    f = state.fields
    out = {}
    geom = cfg.geometry
    crops = _phys_crop(cfg, staggering)

    def comp(name):
        # averaged Galilean PSATD: the E/B diagnostics read the
        # time-averaged aux fields (Efield_avg_fp)
        if (cfg.psatd_time_averaging and name[0] in "EB"
                and getattr(f, name + "_avg", None) is not None):
            arr = getattr(f, name + "_avg")
        else:
            arr = getattr(f, name)
        if crops is not None:
            arr = arr[crops[name]]
        return arr
    # the full diagnostics read E,B from the AUX fields (CellCenterFunctor is
    # constructed on Efield_aux/Bfield_aux): nodal-averaged for
    # momentum-conserving gathering, identical to fp otherwise
    mc = cfg.field_gathering == "momentum-conserving"
    if mc:
        aux = _nodal_aux_bounded(f, staggering, cfg)
        if crops is not None:
            aux = {k: v[crops[k]] for k, v in aux.items()}
        nodal_flags = (1,) * geom.ndim
        for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
            out[name] = (
                cell_center(aux[name], nodal_flags, geom.n_cell)
            )
    else:
        for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
            out[name] = (
                cell_center(comp(name), staggering[name], geom.n_cell)
            )
    # Vay deposition stores NODAL J (the D-derived current)
    j_flags = (
        {n: (1,) * geom.ndim for n in ("jx", "jy", "jz")}
        if cfg.current_deposition == "vay"
        else staggering
    )
    if cfg.electrostatic != "none":
        # electrostatic runs never deposit J in the PIC loop; the full
        # diagnostic deposits it fresh at output time with relative_time 0
        # (JFunctor.cpp:41-49 deposit_current=true)
        from ..ops.deposit import (
            deposit_current_direct, deposit_current_esirkepov,
        )

        dtype = f.Ex.dtype
        j3 = tuple(jnp.zeros(geom.n_cell, dtype) for _ in range(3))
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp_cfg.do_not_deposit or sp.capacity == 0:
                continue
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            pos = sp.positions(geom.ndim)
            if cfg.current_deposition == "esirkepov":
                jj = deposit_current_esirkepov(
                    pos, sp.ux, sp.uy, sp.uz, w_eff, sp_cfg.charge, geom,
                    cfg.dt, cfg.particle_shape, relative_time=0.0,
                )
            else:
                jj = deposit_current_direct(
                    pos, sp.ux, sp.uy, sp.uz, w_eff, sp_cfg.charge, geom,
                    staggering, cfg.dt, cfg.particle_shape,
                    relative_time=0.0,
                )
            j3 = tuple(a + b for a, b in zip(j3, jj))
        for name, arr in zip(("jx", "jy", "jz"), j3):
            out[name] = (
                cell_center(arr, j_flags[name], geom.n_cell)
            )
    else:
        for name in ("jx", "jy", "jz"):
            out[name] = (
                cell_center(comp(name), j_flags[name], geom.n_cell)
            )

    rho = deposit_total_rho(state, cfg)
    out["rho"] = (cell_center(rho, staggering["rho"], geom.n_cell))
    if getattr(f, "phi", None) is not None:
        # nodal ES potential from the last Poisson solve (diag "phi")
        out["phi"] = (
            cell_center(f.phi, (1,) * geom.ndim, geom.n_cell)
        )

    # divergence-cleaning scalars, when present
    if f.F is not None:
        out["F"] = (
            cell_center(comp("F"), staggering["F"], geom.n_cell)
        )
    if f.G is not None:
        out["G"] = (
            cell_center(comp("G"), staggering["G"], geom.n_cell)
        )

    # divE (nodal) / divB (cell-centered) derived diagnostics
    # (reference: DivEFunctor -> WarpX::ComputeDivE — spectral i k.E under
    # PSATD, finite differences otherwise; DivBFunctor)
    all_periodic = all(
        (cfg.field_bc_lo[d] if cfg.field_bc_lo else "periodic") == "periodic"
        for d in range(geom.ndim)
    )
    if all_periodic:
        from ..solvers import yee as _yee

        if cfg.em_solver == "psatd" and psatd is not None:
            div_e = psatd.spectral_div_e(f)
        else:
            div_e = _yee.compute_div_e(f, geom)
        out["divE"] = (cell_center(div_e, (1,) * geom.ndim, geom.n_cell))
        out["divB"] = (_yee.compute_div_b(f, geom))
    elif cfg.grid_type == "staggered":
        # bounded staggered grids: exact differences on the physical region
        # (nodal dims hold n+1 wall-inclusive values); divE wall values use a
        # zero-exterior one-sided difference
        bcl = cfg.field_bc_lo or ("periodic",) * geom.ndim
        dxs = geom.dx
        div_b = None
        div_e = None
        for d, axn in enumerate(geom.axis_names):
            b_arr = comp("B" + axn)
            if b_arr.shape[d] == geom.n_cell[d] + 1:
                tb = jnp.diff(b_arr, axis=d) / dxs[d]
            else:
                tb = (jnp.roll(b_arr, -1, axis=d) - b_arr) / dxs[d]
            div_b = tb if div_b is None else div_b + tb
            e_arr = comp("E" + axn)
            if bcl[d] != "periodic":
                pad = [(0, 0)] * geom.ndim
                pad[d] = (1, 1)
                te = jnp.diff(jnp.pad(e_arr, pad), axis=d) / dxs[d]
            else:
                te = (e_arr - jnp.roll(e_arr, 1, axis=d)) / dxs[d]
            div_e = te if div_e is None else div_e + te
        out["divE"] = (
            cell_center(div_e, (1,) * geom.ndim, geom.n_cell)
        )
        out["divB"] = (div_b)

    origin = current_origin(state, cfg)
    ppc = jnp.zeros(geom.n_cell, dtype=f.Ex.dtype)
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity:
            ppc = ppc + count_particles_per_cell(
                sp.positions(geom.ndim), sp.alive, geom, origin=origin
            )
    out["part_per_cell"] = (ppc)
    return out
