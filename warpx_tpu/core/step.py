"""The explicit PIC step as pure jittable functions.

Reimplements the reference's OneStep_nosub ordering
(Source/Evolve/WarpXEvolve.cpp:354-460):
  particles: u^{n-1/2} -> u^{n+1/2}, x^n -> x^{n+1}   (gather at x^n)
  deposit J^{n+1/2} (Esirkepov, from x^n -> x^{n+1})
  B += -dt/2 curl E ; E += dt (c^2 curl B - J/eps0) ; B += -dt/2 curl E
plus the synchronization half-pushes (WarpXEvolve.cpp:65-90 Synchronize /
:493-506 backward half push when starting from synchronized u^n).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.deposit import deposit_current_direct, deposit_current_esirkepov
from ..ops.gather import gather_eb
from ..ops.push import PUSHERS, position_step
from ..solvers import yee
from .config import SimConfig
from .state import FieldState, ParticleState, SimState

__all__ = ["pic_step", "push_momenta_half", "wrap_positions"]


def _field_dict(fields: FieldState):
    return {
        "Ex": fields.Ex,
        "Ey": fields.Ey,
        "Ez": fields.Ez,
        "Bx": fields.Bx,
        "By": fields.By,
        "Bz": fields.Bz,
    }


def wrap_positions(sp: ParticleState, geom) -> ParticleState:
    """Periodic particle boundary: wrap into [lo, hi) on every active axis.

    The reference handles this in Redistribute after the push
    (WarpXEvolve.cpp:540-564); non-periodic boundaries come later as masks.
    """
    pos = sp.positions(geom.ndim)
    wrapped = []
    for d in range(geom.ndim):
        lo, hi = geom.prob_lo[d], geom.prob_hi[d]
        length = hi - lo
        wrapped.append(lo + jnp.mod(pos[d] - lo, length))
    return sp.with_positions(geom.ndim, wrapped)


def push_momenta_half(
    state: SimState, cfg: SimConfig, staggering: Dict, dt_half: float
) -> SimState:
    """PushP: gather at current positions, momentum push by dt_half only.

    Used with -dt/2 to desynchronize at startup and +dt/2 to synchronize for
    output (reference: PhysicalParticleContainer::PushP, WarpXEvolve.cpp:65,493).
    """
    geom = cfg.geometry
    farr = _field_dict(state.fields)
    new_species = {}
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp_cfg.do_not_push or sp.capacity == 0:
            new_species[sp_cfg.name] = sp
            continue
        pos = sp.positions(geom.ndim)
        ex, ey, ez, bx, by, bz = gather_eb(
            pos, farr, staggering, geom, cfg.particle_shape, cfg.galerkin
        )
        pusher = PUSHERS[sp_cfg.pusher]
        ux, uy, uz = pusher(
            sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
            sp_cfg.charge, sp_cfg.mass, dt_half,
        )
        new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
    return state.replace(species=new_species)


def pic_step(state: SimState, cfg: SimConfig, staggering: Dict) -> SimState:
    """One explicit electromagnetic PIC step (periodic boundaries)."""
    geom = cfg.geometry
    dt = cfg.dt
    farr = _field_dict(state.fields)

    j_total = None
    new_species = {}
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity == 0:
            new_species[sp_cfg.name] = sp
            continue
        pos = sp.positions(geom.ndim)
        if sp_cfg.do_not_gather:
            zeros = jnp.zeros_like(sp.ux)
            ex = ey = ez = bx = by = bz = zeros
        else:
            ex, ey, ez, bx, by, bz = gather_eb(
                pos, farr, staggering, geom, cfg.particle_shape, cfg.galerkin
            )
        if sp_cfg.do_not_push:
            ux, uy, uz = sp.ux, sp.uy, sp.uz
            new_pos = pos
        else:
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
                sp_cfg.charge, sp_cfg.mass, dt,
            )
            new_pos = position_step(pos, ux, uy, uz, dt, geom.ndim)

        if not sp_cfg.do_not_deposit:
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            if cfg.current_deposition == "esirkepov":
                jx, jy, jz = deposit_current_esirkepov(
                    new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                    geom, dt, cfg.particle_shape,
                    chunk_size=cfg.deposit_chunk_size,
                )
            else:
                jx, jy, jz = deposit_current_direct(
                    new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                    geom, staggering, dt, cfg.particle_shape,
                )
            j_total = (
                (jx, jy, jz)
                if j_total is None
                else (j_total[0] + jx, j_total[1] + jy, j_total[2] + jz)
            )

        sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
        sp_new = sp_new.with_positions(geom.ndim, new_pos)
        new_species[sp_cfg.name] = wrap_positions(sp_new, geom)

    if j_total is None:
        shape = state.fields.Ex.shape
        dtype = state.fields.Ex.dtype
        j_total = tuple(jnp.zeros(shape, dtype) for _ in range(3))

    fields = state.fields.replace(jx=j_total[0], jy=j_total[1], jz=j_total[2])

    # Field advance: B half, E full, B half (WarpXEvolve.cpp:418-446)
    fields = yee.evolve_b(fields, geom, 0.5 * dt)
    fields = yee.evolve_e(fields, geom, dt)
    fields = yee.evolve_b(fields, geom, 0.5 * dt)

    return state.replace(
        fields=fields,
        species=new_species,
        step=state.step + 1,
        time=state.time + dt,
    )
