"""Tile-binned explicit EM PIC step — the TPU performance path.

Same physics as core/step.py pic_step (OneStep_nosub,
Source/Evolve/WarpXEvolve.cpp:354-460) restricted to its hot core
(3D periodic, explicit Yee/CKC/PSATD, Boris/Vay/HC push, Esirkepov
deposition, no particle creation), but executed through the tile-binned
layout (ops/tiling.py) and the fused Pallas gather+push+deposit kernel
(ops/pallas_pic.py):

  rebin every ``interval`` steps (SortParticlesByBin analog,
  WarpXEvolve.cpp:575-580) -> extract per-tile field windows
  (FillBoundary analog) -> fused kernel per species -> fold J windows
  (SumBoundary analog) -> Maxwell advance (shared advance_fields).

Positions are deliberately left unwrapped between rebins so that
window-relative coordinates stay continuous across the periodic boundary;
rebin wraps them.  ``state.aux['tile_overflow']`` and
``state.aux['tile_violations']`` accumulate layout-safety counters that the
host must assert to be zero (checked by Simulation at flush time).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.pallas_pic import binned_push_deposit, pad_fields
from ..ops.tiling import TileSpec, fold_windows, rebin
from .config import SimConfig
from .state import SimState
from .step import advance_fields

__all__ = ["binned_supported", "bounded_binned_supported",
           "make_binned_step", "binned_capacity"]

# per-component window-axis order emitted by the fused kernel
_FOLD_AXES = {3: ((0, 1, 2), (1, 0, 2), (2, 0, 1)),
              2: ((0, 1), (0, 1), (0, 1))}


def binned_supported(cfg: SimConfig) -> bool:
    """Whether the fused tile-binned path covers this configuration."""
    geom = cfg.geometry
    if cfg.tiled_particles == "off":
        return False
    if geom.ndim not in (2, 3) or not geom.all_periodic:
        return False
    if cfg.em_solver not in ("yee", "ckc", "psatd", "none"):
        return False
    if cfg.em_solver_medium != "vacuum":
        return False
    if cfg.em_solver == "psatd":
        # rho-free standard PSATD only (current correction / multi-J need
        # rho deposits not yet fused into the kernel)
        if (cfg.psatd_current_correction or cfg.psatd_update_with_rho
                or cfg.psatd_j_in_time != "constant"
                or any(cfg.psatd_v_galilean)):
            return False
    if cfg.current_deposition != "esirkepov":
        return False
    if cfg.grid_type != "staggered":
        return False
    if not (1 <= cfg.particle_shape <= 3):
        return False
    if cfg.do_dive_cleaning or cfg.do_divb_cleaning:
        return False
    if cfg.use_nci_corr or cfg.collisions:
        return False
    tile = cfg.tile_size[-geom.ndim:]
    if any(n % t for n, t in zip(geom.n_cell, tile)):
        return False
    for sp in cfg.species:
        if (sp.do_not_push or sp.do_not_deposit or sp.do_not_gather
                or sp.species_type == "photon" or sp.mass == 0.0
                or sp.do_field_ionization or sp.pusher not in
                ("boris", "vay", "higuera")):
            return False
    return True


def bounded_binned_supported(cfg: SimConfig) -> bool:
    """Whether the tile-binned fused kernel covers this BOUNDED
    configuration (non-periodic boundaries / moving window / lasers —
    core/bounded_step.py ``step_binned``).

    Only the gather+push+deposit block moves onto the fused Pallas kernel;
    pad_eb guard fills, J filtering/folding, the field advance (Yee/CKC/
    PSATD damped/PML), particle boundaries, scraping and continuous
    injection all reuse the slow path's machinery, so most bounded features
    pass through.  The gates below are couplings the kernel genuinely does
    not express (per-particle creation/destruction mid-interval, rho
    deposits, per-source-time galilean origins, non-z window axes...).
    """
    geom = cfg.geometry
    if cfg.tiled_particles == "off":
        return False
    if geom.ndim not in (2, 3) or getattr(geom, "rz", False):
        return False
    if cfg.electrostatic != "none" or cfg.evolve_scheme != "explicit":
        return False
    if cfg.max_level > 0:
        return False
    if cfg.em_solver not in ("yee", "ckc", "psatd"):
        return False
    if cfg.em_solver_medium != "vacuum":
        return False
    if cfg.em_solver == "psatd":
        if (cfg.psatd_current_correction or cfg.psatd_update_with_rho
                or cfg.psatd_j_in_time != "constant"
                or cfg.psatd_time_averaging
                or cfg.multi_j_n_depositions > 1
                or any(cfg.psatd_v_galilean) or any(cfg.psatd_v_comoving)):
            return False
    if cfg.current_deposition != "esirkepov":
        return False
    if cfg.grid_type != "staggered":
        return False
    if cfg.field_gathering == "momentum-conserving":
        return False
    if not (1 <= cfg.particle_shape <= 3):
        return False
    if cfg.do_dive_cleaning or cfg.do_divb_cleaning:
        return False
    if cfg.collisions or cfg.lattice_elements:
        return False
    if cfg.eb_implicit_function:
        return False
    if cfg.do_moving_window and cfg.moving_window_dir != geom.ndim - 1:
        return False
    tile = cfg.tile_size[-geom.ndim:]
    if any(n % t for n, t in zip(geom.n_cell, tile)):
        return False
    for sp in cfg.species:
        if sp.injection_style == "laser":
            continue  # the antenna deposits via the slow path, in-step
        if (sp.do_not_push or sp.do_not_deposit or sp.do_not_gather
                or sp.species_type == "photon" or sp.mass == 0.0
                or sp.do_field_ionization or sp.do_resampling
                or sp.do_qed_quantum_sync or sp.do_qed_breit_wheeler
                or sp.zinject_plane is not None
                or sp.injection_style == "nfluxpercell"
                or sp.pusher not in ("boris", "vay", "higuera")):
            return False
    return True


def make_tile_spec(cfg: SimConfig, n_particles: int) -> TileSpec:
    import math

    from ..constants import c as _c

    geom = cfg.geometry
    margin = cfg.sort_margin
    if margin <= 0:
        # worst-case drift: c*dt/dx cells per step, for sort_interval steps
        per_step = max(_c * cfg.dt / d for d in geom.dx)
        margin = max(1, int(math.ceil(cfg.sort_interval * per_step)))
    return TileSpec.create(
        geom.n_cell,
        order=cfg.particle_shape,
        n_particles=n_particles,
        tile=cfg.tile_size,
        margin=margin,
        interval=cfg.sort_interval,
        headroom=cfg.tile_headroom,
    )


def binned_capacity(cfg: SimConfig, n_particles: int) -> int:
    return make_tile_spec(cfg, n_particles).capacity


def binned_pic_step(
    state: SimState,
    cfg: SimConfig,
    staggering: Dict,
    spec: TileSpec,
    psatd=None,
    interpret: bool = False,
) -> SimState:
    """One fused explicit EM PIC step over the tile-binned layout."""
    geom = cfg.geometry
    dt = cfg.dt
    nt, pmax, w = spec.n_tiles, spec.p_max, spec.w
    f = state.fields.Ex.dtype
    stag_items = tuple(sorted((k, tuple(v)) for k, v in staggering.items()))

    # --- rebin (every spec.interval steps) -------------------------------
    do_rebin = (state.step % spec.interval) == 0
    species = dict(state.species)
    overflow = state.aux.get("tile_overflow", jnp.zeros((), jnp.int32))
    for sp_cfg in cfg.species:
        sp = species[sp_cfg.name]

        def _rebin(s):
            new, ovf = rebin(s, geom, spec)
            return new, ovf.astype(jnp.int32)

        def _keep(s):
            return s, jnp.zeros((), jnp.int32)

        sp, ovf = jax.lax.cond(do_rebin, _rebin, _keep, sp)
        overflow = overflow + ovf
        species[sp_cfg.name] = sp

    # --- guard-padded fields (FillBoundary analog; windows are DMA'd from
    # these inside the fused kernel) ---------------------------------------
    farr = state.fields
    fields6 = pad_fields(
        (farr.Ex, farr.Ey, farr.Ez, farr.Bx, farr.By, farr.Bz),
        spec, cfg.tile_mxu,
    )

    # --- fused gather+push+deposit: all species of one pusher share a
    # single launch (species-innermost grid; J accumulates in VMEM) --------
    jw_tot = None
    violations = state.aux.get("tile_violations", jnp.zeros((), jnp.int32))
    new_species = {}
    groups: Dict[str, list] = {}
    for sp_cfg in cfg.species:
        groups.setdefault(sp_cfg.pusher, []).append(sp_cfg)
    ndim = geom.ndim
    for pusher_name, sps in groups.items():
        n_pin = 7 if ndim == 3 else 6
        cols = [[] for _ in range(n_pin)]
        cnts = []
        for sp_cfg in sps:
            sp = species[sp_cfg.name]
            w_eff = jnp.where(sp.alive, sp.w, jnp.zeros((), f))
            arrs = (
                (sp.x, sp.y, sp.z, sp.ux, sp.uy, sp.uz, w_eff)
                if ndim == 3
                else (sp.x, sp.z, sp.ux, sp.uy, sp.uz, w_eff)
            )
            for ci, a in enumerate(arrs):
                cols[ci].append(a.reshape(nt, pmax))
            cnts.append(
                sp.alive.reshape(nt, pmax).sum(axis=1).astype(jnp.int32)
            )
        parts7 = tuple(
            c[0] if len(c) == 1 else jnp.concatenate(c, axis=0)
            for c in cols
        )
        counts = cnts[0] if len(cnts) == 1 else jnp.concatenate(cnts)
        params = jnp.array(
            [[sp_cfg.charge, sp_cfg.mass, *cfg.e_ext_particle,
              *cfg.b_ext_particle] for sp_cfg in sps], f,
        )
        newp, jw, viol = binned_push_deposit(
            params, fields6, parts7, counts=counts,
            spec=spec, geom=geom, order=cfg.particle_shape,
            galerkin=cfg.galerkin, pusher_name=pusher_name, dt=dt,
            stag_items=stag_items, mxu=cfg.tile_mxu, interpret=interpret,
        )
        jw_tot = jw if jw_tot is None else tuple(
            a + b for a, b in zip(jw_tot, jw)
        )
        violations = violations + jnp.sum(viol)
        for k, sp_cfg in enumerate(sps):
            sp = species[sp_cfg.name]
            sl = slice(k * nt, (k + 1) * nt)
            flat = [a[sl].reshape(-1) for a in newp]
            if ndim == 3:
                new_species[sp_cfg.name] = sp.replace(
                    x=flat[0], y=flat[1], z=flat[2],
                    ux=flat[3], uy=flat[4], uz=flat[5],
                )
            else:
                new_species[sp_cfg.name] = sp.replace(
                    x=flat[0], z=flat[1],
                    ux=flat[2], uy=flat[3], uz=flat[4],
                )

    # --- fold J windows (SumBoundary analog) ------------------------------
    if jw_tot is None:
        j_total = tuple(jnp.zeros(geom.n_cell, f) for _ in range(3))
    else:
        j_total = tuple(
            fold_windows(jw_tot[i], spec, geom.n_cell,
                         axes=_FOLD_AXES[geom.ndim][i])
            for i in range(3)
        )

    fields = advance_fields(
        state.fields, cfg, j_total, None, None, None, psatd
    )
    aux = dict(state.aux)
    aux["tile_overflow"] = overflow
    aux["tile_violations"] = violations
    return state.replace(
        fields=fields,
        species=new_species,
        step=state.step + 1,
        time=state.time + dt,
        aux=aux,
    )


def make_binned_step(cfg, staggering, spec, psatd=None, interpret=False):
    return jax.jit(
        functools.partial(
            binned_pic_step,
            cfg=cfg, staggering=staggering, spec=spec, psatd=psatd,
            interpret=interpret,
        )
    )
