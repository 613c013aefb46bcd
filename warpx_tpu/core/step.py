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

import jax
import jax.numpy as jnp

from ..ops.deposit import deposit_current_direct, deposit_current_esirkepov
from ..ops.gather import gather_eb
from ..ops.push import PUSHERS, position_step
from ..solvers import yee
from .config import SimConfig
from .state import FieldState, ParticleState, SimState

__all__ = ["pic_step", "push_momenta_half", "wrap_positions"]


def _add_ext(e6, cfg, pos=None, u3=None):
    """Add external particle fields: constants (GetExternalEBField) and
    accelerator-lattice elements (Source/AcceleratorLattice/LatticeElements:
    hard-edged quad/plasma lens with the residence-fraction correction,
    HardEdged_K.H:25-46).  ``pos``/``u3`` enable the lattice terms (3D)."""
    ex, ey, ez, bx, by, bz = e6
    Ee = cfg.e_ext_particle
    Be = cfg.b_ext_particle
    if any(Ee) or any(Be):
        ex, ey, ez = ex + Ee[0], ey + Ee[1], ez + Ee[2]
        bx, by, bz = bx + Be[0], by + Be[1], bz + Be[2]
    if cfg.lattice_elements and pos is not None and len(pos) == 3:
        from ..ops.push import inv_gamma

        x, y, z = pos
        uxp, uyp, uzp = u3
        zpvdt = z + uzp * inv_gamma(uxp, uyp, uzp) * cfg.dt
        zl = jnp.minimum(z, zpvdt)
        zr = jnp.maximum(z, zpvdt)
        for kind, zs, ze, dEdx, dBdx in cfg.lattice_elements:
            zlb = jnp.clip(zl, zs, ze)
            zrb = jnp.clip(zr, zs, ze)
            denom = jnp.where(zr == zl, 1.0, zr - zl)
            frac = jnp.where(
                zr == zl,
                ((z >= zs) & (z < ze)).astype(z.dtype),
                (zrb - zlb) / denom,
            )
            fe = frac * dEdx
            fb = frac * dBdx
            if kind == "quad":
                ex = ex + x * fe
                ey = ey - y * fe
                bx = bx + y * fb
                by = by + x * fb
            else:  # plasmalens
                ex = ex + x * fe
                ey = ey + y * fe
                bx = bx + y * fb
                by = by - x * fb
    return (ex, ey, ez, bx, by, bz)


def _field_dict(fields: FieldState, use_avg: bool = False):
    """Gather source fields; averaged Galilean PSATD gathers from the
    time-averaged fields (Efield_avg_aux, WarpXComm.cpp aux selection)."""
    if use_avg and fields.Ex_avg is not None:
        return {
            "Ex": fields.Ex_avg, "Ey": fields.Ey_avg, "Ez": fields.Ez_avg,
            "Bx": fields.Bx_avg, "By": fields.By_avg, "Bz": fields.Bz_avg,
        }
    return {
        "Ex": fields.Ex,
        "Ey": fields.Ey,
        "Ez": fields.Ez,
        "Bx": fields.Bx,
        "By": fields.By,
        "Bz": fields.Bz,
    }


def fornberg_centering_coeffs(n_order: int):
    """Half-cell Fornberg interpolation coefficients (one side, j=0..m-1;
    applied weight per sample is c_j/2).  Reference:
    WarpX::getFornbergStencilCoefficients (WarpX.cpp:3119, staggered)."""
    import numpy as _np

    m = n_order // 2
    prod = 1.0
    for k in range(1, m + 1):
        prod *= (m + k) / (4.0 * k)
    c = _np.zeros(m)
    c[0] = 4.0 * m * prod * prod
    for n in range(1, m):
        c[n] = -((2 * n - 1) * (m - n)) / ((2 * n + 1) * (m + n)) * c[n - 1]
    return c


def _nodal_aux(farr: Dict, staggering: Dict, orders=None) -> Dict:
    """Interpolate staggered fields to the nodal grid for momentum-conserving
    gathering (reference: WarpXComm.cpp UpdateAuxilaryDataStagToNodal):
    2nd-order averaging by default; finite-order Fornberg centering per dim
    when ``orders`` is given (warpx.field_centering_no*, grid_type=hybrid
    defaults to 8)."""
    out = {}
    for name, arr in farr.items():
        a = arr
        for d, flag in enumerate(staggering[name]):
            if flag != 0:
                continue
            no = orders[d] if orders else 2
            if no <= 2:
                a = 0.5 * (a + jnp.roll(a, 1, axis=d))
            else:
                c = fornberg_centering_coeffs(no)
                acc = 0.0
                for j, cj in enumerate(c):
                    # value at node i from samples at i+j+1/2 and i-j-1/2:
                    # staggered array index i+j (right) and i-1-j (left)
                    acc = acc + 0.5 * cj * (
                        jnp.roll(a, -(j), axis=d)
                        + jnp.roll(a, j + 1, axis=d)
                    )
                a = acc
        out[name] = a
    return out


def rigid_scale_fields(e6, z, z_plane_prev, vz_ave, v_boost, dt):
    """Scale gathered fields for particles about to cross the injection
    plane (ScaleFields.H:50: dtscale approximates a fractional push)."""
    denom = vz_ave + v_boost
    denom = jnp.where(denom == 0.0, 1.0, denom)
    dtscale = 1.0 - (z_plane_prev - z) / denom / dt
    s = jnp.where((dtscale > 0.0) & (dtscale < 1.0), dtscale, 1.0)
    return tuple(f * s for f in e6)


def rigid_undo_push(pos_old, u_old3, pos_new, u_new3, z_plane_new,
                    vz_ave, dt, rigid_advance, ndim):
    """Undo the push for particles that have not crossed the injection
    plane yet (RigidInjectedParticleContainer.cpp:250-290): restore u and
    transverse positions; z advances rigidly at vz_ave (or ballistically).
    Returns (pos, u3)."""
    from ..ops.push import inv_gamma

    zax = ndim - 1
    not_inj = pos_new[zax] <= z_plane_new
    u3 = tuple(
        jnp.where(not_inj, uo, un) for uo, un in zip(u_old3, u_new3)
    )
    if rigid_advance:
        z_rigid = pos_old[zax] + dt * vz_ave
    else:
        gi = inv_gamma(*u_old3)
        z_rigid = pos_old[zax] + dt * u_old3[2] * gi
    pos = [
        jnp.where(not_inj, po, pn)
        for po, pn in zip(pos_old[:zax], pos_new[:zax])
    ]
    pos.append(jnp.where(not_inj, z_rigid, pos_new[zax]))
    return pos, u3


def wrap_positions(sp: ParticleState, geom, shift=None) -> ParticleState:
    """Periodic particle boundary: wrap into [lo, hi) on every active axis.

    The reference handles this in Redistribute after the push
    (WarpXEvolve.cpp:540-564); non-periodic boundaries come later as masks.
    ``shift`` (per active dim) wraps into the DRIFTED domain
    [lo+shift, hi+shift) of a Galilean run — the reference's prob_lo/hi move
    with ShiftGalileanBoundary, so its particles wrap into the moving box
    (this is what the position checksums record).
    """
    pos = sp.positions(geom.ndim)
    wrapped = []
    for d in range(geom.ndim):
        lo, hi = geom.prob_lo[d], geom.prob_hi[d]
        if shift is not None:
            lo = lo + shift[d]
            hi = hi + shift[d]
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
    farr = _field_dict(state.fields, use_avg=cfg.psatd_time_averaging)
    gather_stag = staggering
    if cfg.field_gathering == "momentum-conserving":
        farr = _nodal_aux(farr, staggering, cfg.field_centering_no or None)
        gather_stag = {k: (1,) * geom.ndim for k in staggering}
    new_species = {}
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if (sp_cfg.do_not_push or sp.capacity == 0
                or sp_cfg.species_type == "photon" or sp_cfg.mass == 0.0):
            new_species[sp_cfg.name] = sp
            continue
        pos = sp.positions(geom.ndim)
        ex, ey, ez, bx, by, bz = _add_ext(
            gather_eb(
                pos, farr, gather_stag, geom, cfg.particle_shape, cfg.galerkin
            ),
            cfg,
        )
        pusher = PUSHERS[sp_cfg.pusher]
        ux, uy, uz = pusher(
            sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
            sp_cfg.charge, sp_cfg.mass, dt_half,
        )
        new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
    return state.replace(species=new_species)


def _apply_nci(farr, cfg):
    """Godfrey NCI corrector on the GATHER fields along z (reference:
    WarpXComm.cpp UpdateAuxilaryData applies nci_godfrey_filter_exeybz /
    _bxbyez to the aux fields; requires Esirkepov deposition)."""
    from ..constants import c as _c_
    from ..solvers.filter import apply_z_stencil, nci_godfrey_stencil

    geom = cfg.geometry
    zax = geom.ndim - 1
    cdtodz = _c_ * cfg.dt / geom.dx[zax]
    nodal = cfg.field_gathering == "momentum-conserving"
    s1 = nci_godfrey_stencil(cdtodz, "ExEyBz", nodal)
    s2 = nci_godfrey_stencil(cdtodz, "BxByEz", nodal)
    out = dict(farr)
    for nm in ("Ex", "Ey", "Bz"):
        out[nm] = apply_z_stencil(out[nm], s1, zax)
    for nm in ("Bx", "By", "Ez"):
        out[nm] = apply_z_stencil(out[nm], s2, zax)
    return out


def pic_step(
    state: SimState, cfg: SimConfig, staggering: Dict, psatd=None,
    medium=None,
) -> SimState:
    """One explicit electromagnetic PIC step (periodic boundaries)."""
    geom = cfg.geometry
    dt = cfg.dt
    farr = _field_dict(state.fields, use_avg=cfg.psatd_time_averaging)
    gather_stag = staggering
    if cfg.use_nci_corr:
        farr = _apply_nci(farr, cfg)
    if cfg.field_gathering == "momentum-conserving":
        farr = _nodal_aux(farr, staggering, cfg.field_centering_no or None)
        gather_stag = {k: (1,) * geom.ndim for k in staggering}

    # Galilean PSATD: the grid coordinates drift at v_galilean every step
    # (WarpXEvolve.cpp:234 ShiftGalileanBoundary, unconditionally), realized
    # here as a time-dependent deposition/gather origin.  CRUCIAL: each
    # source is deposited with the origin evaluated AT ITS OWN TIME — J at
    # t^{n+1/2} and rho_new at t^{n+1} (reference: WarpX::LowerCorner's
    # time_shift_delta argument, WarpXParticleContainer.cpp:479 "0.5*dt" for
    # J and :992,:1161 "icomp==0 ? 0 : dt" for rho; gather and rho_old use
    # shift 0, PhysicalParticleContainer.cpp:2599).  With a uniform origin
    # the scheme's galilean continuity identity
    # rho_new = T2 rho_old + (1-T2) k.J/w_c is violated at O(k v dt) and the
    # NCI cancellation turns into a strong instability (round-2/3 bug).
    gal_origin = None          # o(t^n): gather + rho_old
    gal_origin_half = None     # o(t^n + dt/2): J
    gal_origin_new = None      # o(t^{n+1}): rho_new
    if any(cfg.psatd_v_galilean):
        _ax = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[geom.ndim]
        v_act = [cfg.psatd_v_galilean[_ax[d]] for d in range(geom.ndim)]
        gal_origin = [
            geom.prob_lo[d] + v_act[d] * state.time
            for d in range(geom.ndim)
        ]
        gal_origin_half = [
            o + v * (0.5 * dt) for o, v in zip(gal_origin, v_act)
        ]
        gal_origin_new = [
            o + v * dt for o, v in zip(gal_origin, v_act)
        ]

    # binary collisions then ionization before the main push
    # (WarpXEvolve.cpp:157-166 doFieldIonization / doCollisions ordering)
    coulomb_cols = [c for c in cfg.collisions if c.kind == "pairwisecoulomb"]
    if coulomb_cols:
        from ..ops.collisions import (
            inter_species_coulomb, intra_species_coulomb,
        )

        species_mut = dict(state.species)
        rng = state.rng
        by_name = {s.name: s for s in cfg.species}
        for col in coulomb_cols:
            # subcycling: collide when step % ndt == 0, with dt*ndt
            # (CollisionHandler.cpp:89-91)
            rng, sub = jax.random.split(rng)
            do_now = (state.step % col.ndt) == 0
            dt_coll = dt * col.ndt
            if col.species[0] == col.species[1]:
                sp_cfg = by_name[col.species[0]]
                sp = species_mut[sp_cfg.name]
                sp = jax.lax.cond(
                    do_now,
                    lambda s: intra_species_coulomb(
                        s, sp_cfg.charge, sp_cfg.mass, geom, dt_coll, sub,
                        coulomb_log=col.coulomb_log,
                    )[0],
                    lambda s: s,
                    sp,
                )
                species_mut[sp_cfg.name] = sp
            else:
                c1 = by_name[col.species[0]]
                c2 = by_name[col.species[1]]
                sp1, sp2 = jax.lax.cond(
                    do_now,
                    lambda ss: inter_species_coulomb(
                        ss[0], c1.charge, c1.mass,
                        ss[1], c2.charge, c2.mass,
                        geom, dt_coll, sub, coulomb_log=col.coulomb_log,
                    )[:2],
                    lambda ss: ss,
                    (species_mut[c1.name], species_mut[c2.name]),
                )
                species_mut[c1.name] = sp1
                species_mut[c2.name] = sp2
        state = state.replace(species=species_mut, rng=rng)

    fusion_cols = [c for c in cfg.collisions if c.kind == "nuclearfusion"]
    if fusion_cols:
        from ..ops.fusion import fusion_collision_update

        rng = state.rng
        for col in fusion_cols:
            rng, sub = jax.random.split(rng)
            do_now = (state.step % col.ndt) == 0
            state = jax.lax.cond(
                do_now,
                lambda s, k=sub, c=col: fusion_collision_update(
                    s, cfg, c, dt * c.ndt, k
                ),
                lambda s: s,
                state,
            )
        state = state.replace(rng=rng)

    dsmc_cols = [c for c in cfg.collisions if c.kind == "dsmc"]
    if dsmc_cols:
        from ..ops.dsmc import dsmc_collision_update

        rng = state.rng
        for col in dsmc_cols:
            rng, sub = jax.random.split(rng)
            do_now = (state.step % col.ndt) == 0
            state = jax.lax.cond(
                do_now,
                lambda s, k=sub, c=col: dsmc_collision_update(
                    s, cfg, c, dt * c.ndt, k
                ),
                lambda s: s,
                state,
            )
        state = state.replace(rng=rng)

    if any(c.kind == "background_mcc" for c in cfg.collisions):
        from ..ops.mcc import mcc_collision_update

        state = mcc_collision_update(state, cfg, dt)
    if any(c.kind == "background_stopping" for c in cfg.collisions):
        from ..ops.stopping import stopping_collision_update

        state = stopping_collision_update(state, cfg, dt)

    # field ionization before the main push (WarpXEvolve.cpp:157
    # doFieldIonization uses the aux fields at t^n)
    ionizable = [sp for sp in cfg.species if sp.do_field_ionization]
    if ionizable:
        from ..ops.deposit import deposit_rho  # noqa: F401 (import order)
        from ..ops.ionization import (
            IONIZATION_ENERGIES, adk_coefficients, apply_ionization,
        )

        species_mut = dict(state.species)
        rng = state.rng
        for sp_cfg in ionizable:
            ion = species_mut[sp_cfg.name]
            prod = species_mut[sp_cfg.ionization_product_species]
            coeffs = adk_coefficients(sp_cfg.physical_element, dt)
            z_max = len(IONIZATION_ENERGIES[sp_cfg.physical_element])
            e6 = gather_eb(
                ion.positions(geom.ndim), farr, gather_stag, geom,
                cfg.particle_shape, cfg.galerkin,
            )
            ion, prod, rng = apply_ionization(
                rng, ion, prod, e6, coeffs, z_max
            )
            species_mut[sp_cfg.name] = ion
            species_mut[sp_cfg.ionization_product_species] = prod
        state = state.replace(species=species_mut, rng=rng)

    # QED events (quantum sync / Breit-Wheeler / Schwinger) before the push
    # (doQEDEvents / doQEDSchwinger, WarpXEvolve.cpp)
    if any(s.do_qed_quantum_sync or s.do_qed_breit_wheeler
           for s in cfg.species):
        from ..ops.qed import qed_update

        def _e6_of(name):
            sp_q = state.species[name]
            pos_q = sp_q.positions(geom.ndim)
            return _add_ext(
                gather_eb(
                    pos_q, farr, gather_stag, geom,
                    cfg.particle_shape, cfg.galerkin,
                ),
                cfg, pos=pos_q, u3=(sp_q.ux, sp_q.uy, sp_q.uz),
            )

        state = qed_update(state, cfg, _e6_of, dt)
    if cfg.do_qed_schwinger:
        from ..ops.qed import schwinger_update

        state = schwinger_update(state, cfg, dt)

    first_order = (
        cfg.em_solver == "psatd"
        and cfg.psatd_solution_type == "first-order"
    )
    multi_j = (
        cfg.em_solver == "psatd" and cfg.psatd_j_in_time == "linear"
        and not first_order
    )
    need_rho = not first_order and (
        (
            cfg.em_solver == "psatd"
            and (cfg.psatd_current_correction or cfg.psatd_update_with_rho)
        ) or cfg.do_dive_cleaning or multi_j or cfg.em_solver == "hybrid"
    )
    mj_parts = []
    rho_old = rho_new = None
    if need_rho:
        from ..ops.deposit import deposit_rho

        rho_old = jnp.zeros(geom.n_cell, state.fields.Ex.dtype)
        rho_new = jnp.zeros(geom.n_cell, state.fields.Ex.dtype)

    j_total = None
    j_old_total = None
    new_species = {}
    aux_updates = {}
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity == 0:
            new_species[sp_cfg.name] = sp
            continue
        pos = sp.positions(geom.ndim)
        if need_rho and not sp_cfg.do_not_deposit and not multi_j:
            from ..ops.deposit import deposit_rho

            w_eff0 = jnp.where(sp.alive, sp.w, 0.0)
            rho_old = deposit_rho(
                pos, w_eff0, sp_cfg.charge, geom, cfg.particle_shape,
                out=rho_old, origin=gal_origin,
            )
        if sp_cfg.do_not_gather:
            zeros = jnp.zeros_like(sp.ux)
            ex = ey = ez = bx = by = bz = zeros
        else:
            ex, ey, ez, bx, by, bz = _add_ext(
                gather_eb(
                    pos, farr, gather_stag, geom, cfg.particle_shape,
                    cfg.galerkin, origin=gal_origin,
                ),
                cfg, pos=pos, u3=(sp.ux, sp.uy, sp.uz),
            )
        if sp_cfg.do_not_push:
            ux, uy, uz = sp.ux, sp.uy, sp.uz
            new_pos = pos
        elif sp_cfg.species_type == "photon":
            # massless: free-streaming at c along u, momentum unchanged
            # (PhotonParticleContainer::PushPX)
            from ..ops.push import photon_position_step

            ux, uy, uz = sp.ux, sp.uy, sp.uz
            new_pos = photon_position_step(pos, ux, uy, uz, dt, geom.ndim)
        else:
            rigid = sp_cfg.zinject_plane is not None
            if rigid:
                import math as _math

                v_boost = (
                    _math.sqrt(1.0 - 1.0 / cfg.gamma_boost**2) * 299792458.0
                    if cfg.gamma_boost > 1.0 else 0.0
                )
                zp_prev = state.aux[f"zinject:{sp_cfg.name}"]
                zp_new = zp_prev - dt * v_boost
                vz_ave = state.aux[f"vzave:{sp_cfg.name}"]
                ex, ey, ez, bx, by, bz = rigid_scale_fields(
                    (ex, ey, ez, bx, by, bz), pos[geom.ndim - 1],
                    zp_prev, vz_ave, v_boost, dt,
                )
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
                sp_cfg.charge, sp_cfg.mass, dt,
            )
            new_pos = position_step(pos, ux, uy, uz, dt, geom.ndim)
            if rigid:
                new_pos, (ux, uy, uz) = rigid_undo_push(
                    pos, (sp.ux, sp.uy, sp.uz), new_pos, (ux, uy, uz),
                    zp_new, vz_ave, dt, sp_cfg.rigid_advance, geom.ndim,
                )
                aux_updates[f"zinject:{sp_cfg.name}"] = zp_new

        # QED optical-depth evolution with the updated momentum and the
        # fields gathered at x^n (PushPX evolve_opt_depth; the emission
        # events themselves run at the start of the next step, doQEDEvents)
        qed_extra = None
        if sp_cfg.do_qed_quantum_sync:
            from ..ops.qed import qs_dndt

            tau_q = sp.extra["opticalDepthQSR"] - dt * qs_dndt(
                ux, uy, uz, ex, ey, ez, bx, by, bz
            )
            qed_extra = {"opticalDepthQSR": tau_q}
        elif sp_cfg.do_qed_breit_wheeler:
            from ..ops.qed import bw_dndt

            tau_q = sp.extra["opticalDepthBW"] - dt * bw_dndt(
                ux, uy, uz, ex, ey, ez, bx, by, bz
            )
            qed_extra = {"opticalDepthBW": tau_q}

        if first_order and not sp_cfg.do_not_deposit:
            # multi-J first-order: deposits happen inside the sub-step loop
            # (OneStep_multiJ) — collect the pushed state per species
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            mj_parts.append((new_pos, (ux, uy, uz), w_eff, sp_cfg))
        elif multi_j and not sp_cfg.do_not_deposit:
            # multi-J (n_depositions=1): J and rho sampled at INTEGER times
            # (OneStep_multiJ, WarpXEvolve.cpp:660-780): J_old/rho_old at
            # relative time -dt (ballistic back from x^{n+1}), J_new/rho_new
            # at the new positions
            from ..ops.deposit import deposit_rho

            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            jo = deposit_current_direct(
                new_pos, ux, uy, uz, w_eff, sp_cfg.charge, geom,
                staggering, dt, cfg.particle_shape,
                relative_time=-dt, origin=gal_origin_half,
            )
            jn = deposit_current_direct(
                new_pos, ux, uy, uz, w_eff, sp_cfg.charge, geom,
                staggering, dt, cfg.particle_shape,
                relative_time=0.0, origin=gal_origin_half,
            )
            j_old_total = (
                jo if j_old_total is None
                else tuple(a + b for a, b in zip(j_old_total, jo))
            )
            j_total = (
                jn if j_total is None
                else tuple(a + b for a, b in zip(j_total, jn))
            )
            from ..ops.push import inv_gamma as _invg

            ig = _invg(ux, uy, uz)
            vel_act = {
                3: (ux, uy, uz), 2: (ux, uz), 1: (uz,),
            }[geom.ndim]
            pos_ball = [
                p - v * ig * dt for p, v in zip(new_pos, vel_act)
            ]
            rho_old = deposit_rho(
                pos_ball, w_eff, sp_cfg.charge, geom, cfg.particle_shape,
                out=rho_old, origin=gal_origin,
            )
        elif not sp_cfg.do_not_deposit:
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            if cfg.current_deposition == "esirkepov":
                jx, jy, jz = deposit_current_esirkepov(
                    new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                    geom, dt, cfg.particle_shape,
                    chunk_size=cfg.deposit_chunk_size,
                    origin=gal_origin_half,
                )
            elif cfg.current_deposition == "vay":
                from ..ops.deposit import deposit_current_vay

                jx, jy, jz = deposit_current_vay(
                    new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                    geom, dt, cfg.particle_shape,
                    chunk_size=cfg.deposit_chunk_size,
                    origin=gal_origin_half,
                )
            else:
                jx, jy, jz = deposit_current_direct(
                    new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                    geom, staggering, dt, cfg.particle_shape,
                    origin=gal_origin_half,
                )
            j_total = (
                (jx, jy, jz)
                if j_total is None
                else (j_total[0] + jx, j_total[1] + jy, j_total[2] + jz)
            )

        if need_rho and not sp_cfg.do_not_deposit:
            from ..ops.deposit import deposit_rho

            w_eff1 = jnp.where(sp.alive, sp.w, 0.0)
            rho_new = deposit_rho(
                new_pos, w_eff1, sp_cfg.charge, geom, cfg.particle_shape,
                out=rho_new, origin=gal_origin_new,
            )

        sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
        if qed_extra is not None:
            sp_new = sp_new.replace(extra={**sp_new.extra, **qed_extra})
        sp_new = sp_new.with_positions(geom.ndim, new_pos)
        gal_shift_new = (
            [v * (state.time + dt) for v in v_act]
            if gal_origin is not None else None
        )
        new_species[sp_cfg.name] = wrap_positions(
            sp_new, geom, shift=gal_shift_new
        )

    # cold-fluid species: deposit rho^n, push+advect, deposit rho^{n+1} and
    # J from the advanced state (WarpXFluidContainer::Evolve ordering)
    if cfg.fluids:
        from ..solvers.fluids import (
            fluid_current, fluid_evolve, fluid_rho,
        )

        for fl in cfg.fluids:
            Nf = state.aux[f"fluid_N:{fl.name}"]
            NU3 = tuple(
                state.aux[f"fluid_NU{ax}:{fl.name}"] for ax in "xyz"
            )
            if need_rho and not fl.do_not_deposit:
                rho_old = rho_old + fluid_rho(Nf, fl.charge)
            Nf, NU3 = fluid_evolve(
                Nf, NU3, state.fields, geom, staggering, fl, dt
            )
            if need_rho and not fl.do_not_deposit:
                rho_new = rho_new + fluid_rho(Nf, fl.charge)
            if not fl.do_not_deposit:
                jf = fluid_current(Nf, NU3, geom, staggering, fl.charge)
                j_total = jf if j_total is None else tuple(
                    a + b for a, b in zip(j_total, jf)
                )
            aux_updates[f"fluid_N:{fl.name}"] = Nf
            for ax, arr in zip("xyz", NU3):
                aux_updates[f"fluid_NU{ax}:{fl.name}"] = arr

    if first_order:
        if cfg.fluids:
            raise NotImplementedError("fluid species with multi-J PSATD")
        fields = _first_order_multi_j(
            state.fields, cfg, staggering, psatd, mj_parts
        )
        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
            aux={**state.aux, **aux_updates} if aux_updates else state.aux,
        )

    if j_total is None:
        shape = state.fields.Ex.shape
        dtype = state.fields.Ex.dtype
        j_total = tuple(jnp.zeros(shape, dtype) for _ in range(3))

    fields = advance_fields(
        state.fields, cfg, j_total, rho_old, rho_new,
        (j_old_total if j_old_total is not None else j_total)
        if multi_j else None,
        psatd, medium=medium,
    )

    return state.replace(
        fields=fields,
        species=new_species,
        step=state.step + 1,
        time=state.time + dt,
        aux={**state.aux, **aux_updates} if aux_updates else state.aux,
    )


def _first_order_multi_j(fields, cfg, staggering, solver, parts):
    """The multi-J sub-deposition loop with the first-order-form PSATD
    push (OneStep_multiJ, WarpXEvolve.cpp:655-840): particles were already
    pushed to x^{n+1}; each of the n_depositions sub-intervals deposits
    J (and rho, when div cleaning) at ballistic relative times and
    advances the fields by dt/n_depositions.  ``solver`` is a
    PsatdFirstOrder built with the SUB-step dt (WarpX.cpp:2750
    solver_dt /= do_multi_J_n_depositions)."""
    from ..ops.deposit import (
        deposit_current_direct, deposit_current_esirkepov, deposit_rho,
    )
    from ..ops.push import inv_gamma

    geom = cfg.geometry
    dt = cfg.dt
    n_dep = max(1, cfg.multi_j_n_depositions)
    sub_dt = dt / n_dep
    j_lin = cfg.psatd_j_in_time == "linear"
    rho_lin = cfg.psatd_rho_in_time == "linear"
    div_clean = solver.div_cleaning
    shape = fields.Ex.shape
    dtype = fields.Ex.dtype

    def _filter_j(j3):
        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            return tuple(bilinear_filter(a, npass) for a in j3)
        return j3

    def _active_vel(u3, ig):
        return {
            3: tuple(u * ig for u in u3),
            2: (u3[0] * ig, u3[2] * ig),
            1: (u3[2] * ig,),
        }[geom.ndim]

    def dep_j(t_rel):
        tot = tuple(jnp.zeros(shape, dtype) for _ in range(3))
        for pos, u3, w, sp_cfg in parts:
            if cfg.current_deposition == "esirkepov":
                ig = inv_gamma(*u3)
                pos_s = [
                    p + v * t_rel
                    for p, v in zip(pos, _active_vel(u3, ig))
                ]
                j3 = deposit_current_esirkepov(
                    pos_s, *u3, w, sp_cfg.charge, geom, dt,
                    cfg.particle_shape, chunk_size=cfg.deposit_chunk_size,
                )
            else:
                j3 = deposit_current_direct(
                    pos, *u3, w, sp_cfg.charge, geom, staggering, dt,
                    cfg.particle_shape, relative_time=t_rel,
                )
            tot = tuple(a + b for a, b in zip(tot, j3))
        return _filter_j(tot)

    def dep_rho(t_rel):
        tot = jnp.zeros(shape, dtype)
        for pos, u3, w, sp_cfg in parts:
            ig = inv_gamma(*u3)
            pos_s = [
                p + v * t_rel for p, v in zip(pos, _active_vel(u3, ig))
            ]
            tot = deposit_rho(
                pos_s, w, sp_cfg.charge, geom, cfg.particle_shape, out=tot,
            )
        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            tot = bilinear_filter(tot, npass)
        return tot

    j_old = dep_j(-dt) if j_lin else None
    rho_old = dep_rho(-dt) if (div_clean and rho_lin) else None
    j_diag = None
    for i in range(n_dep):
        if j_lin:
            j_new = dep_j((i - n_dep + 1) * sub_dt)
            j_c0 = j_old
            j_c1 = tuple(
                (a - b) / sub_dt for a, b in zip(j_new, j_old)
            )
            j_diag = j_old = j_new
        else:
            j_c0 = dep_j((i - n_dep + 0.5) * sub_dt)
            j_c1 = None
            j_diag = j_c0
        rho_c0 = rho_c1 = None
        if div_clean:
            if rho_lin:
                rho_new = dep_rho((i - n_dep + 1) * sub_dt)
                rho_c0 = rho_old
                rho_c1 = (rho_new - rho_old) / sub_dt
                rho_old = rho_new
            else:
                rho_c0 = dep_rho((i - n_dep + 0.5) * sub_dt)
        fields = solver.push_first_order(
            fields, j_c0, j_c1, rho_c0, rho_c1
        )
    return fields.replace(jx=j_diag[0], jy=j_diag[1], jz=j_diag[2])


def advance_fields(
    fields: FieldState, cfg: SimConfig, j_total, rho_old, rho_new,
    j_old_total, psatd, medium=None,
) -> FieldState:
    """Filter J and advance the Maxwell fields by one step (the tail of
    OneStep_nosub, WarpXEvolve.cpp:373-450: SyncCurrent/filter then the
    B-half/E-full/B-half or PSATD push).  Shared by the reference path
    (pic_step) and the tile-binned Pallas path (binned_step)."""
    geom = cfg.geometry
    dt = cfg.dt
    multi_j = j_old_total is not None
    need_rho = rho_old is not None

    if cfg.use_filter:
        from ..solvers.filter import bilinear_filter

        npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
        j_total = tuple(bilinear_filter(a, npass) for a in j_total)

    fields = fields.replace(jx=j_total[0], jy=j_total[1], jz=j_total[2])

    if cfg.em_solver == "none":
        # algo.maxwell_solver = none: fields are never advanced (reference:
        # WarpX::EvolveEM is skipped; used by pure collision/ES tests)
        pass
    elif cfg.em_solver == "hybrid":
        # kinetic-ion / fluid-electron Ohm's-law advance
        # (WarpXPushFieldsHybridPIC.cpp:24)
        from ..solvers import hybrid as hyb
        from ..utils.expression import compile_expression
        from .grid import yee_staggering

        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            rho_old = bilinear_filter(rho_old, npass)
            rho_new = bilinear_filter(rho_new, npass)
        stag = yee_staggering(geom.ndim)
        eta_fn = compile_expression(
            cfg.hybrid_eta, ("rho", "J"), dict(cfg.user_constants or ())
        )
        # J_i^{n-1/2} carried from the previous step (hybrid_current_fp_temp)
        ji_old = (fields.hjx, fields.hjy, fields.hjz)
        fields = hyb.hybrid_evolve_fields(
            fields, rho_old, rho_new, ji_old, j_total, geom, stag, cfg,
            eta_fn, dt,
        )
        return fields.replace(
            hrho=rho_new, hjx=j_total[0], hjy=j_total[1], hjz=j_total[2],
        )
    elif cfg.em_solver == "psatd":
        # analytic k-space advance (WarpXPushFieldsEM.cpp:717 PushPSATD)
        if need_rho and cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            rho_old = bilinear_filter(rho_old, npass)
            rho_new = bilinear_filter(rho_new, npass)
        if multi_j and cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            j_old_total = tuple(
                bilinear_filter(a, npass) for a in j_old_total
            )
        if cfg.use_hybrid_qed:
            # Heisenberg-Euler half-correction before and after the spectral
            # push (WarpXEvolve.cpp:386-402 Hybrid_QED_Push)
            from ..solvers.hybrid_qed import hybrid_qed_push

            fields = hybrid_qed_push(fields, geom, dt, cfg.quantum_xi_c2)
        fields = psatd.push(
            fields, (rho_old, rho_new) if need_rho else None,
            j_old=j_old_total if multi_j else None,
        )
        if cfg.use_hybrid_qed:
            from ..solvers.hybrid_qed import hybrid_qed_push

            fields = hybrid_qed_push(fields, geom, dt, cfg.quantum_xi_c2)
    else:
        # Field advance: B half, E full, B half (WarpXEvolve.cpp:418-446);
        # collocated grids use centered differences (CartesianNodalAlgorithm).
        # With divergence cleaning the scalars advance half steps around the
        # B pushes (WarpXEvolve.cpp:416-437: F,G,B | E | F,G,B).
        algo = "nodal" if cfg.grid_type == "collocated" else cfg.em_solver
        F, G = fields.F, fields.G
        if cfg.do_dive_cleaning:
            F = yee.evolve_f(F, fields, rho_old, geom, 0.5 * dt, algo)
        if cfg.do_divb_cleaning:
            G = yee.evolve_g(G, fields, geom, 0.5 * dt, algo)
        fields = yee.evolve_b(fields, geom, 0.5 * dt, algo)
        if cfg.do_divb_cleaning:
            fields = yee.add_grad_g(fields, G, geom, 0.5 * dt, algo)
        if medium is not None:
            from ..solvers.macroscopic import evolve_e_macroscopic

            fields = evolve_e_macroscopic(fields, medium, geom, dt, algo)
        else:
            fields = yee.evolve_e(fields, geom, dt, algo)
        if cfg.do_dive_cleaning:
            fields = yee.add_grad_f(fields, F, geom, dt, algo)
            F = yee.evolve_f(F, fields, rho_new, geom, 0.5 * dt, algo)
        if cfg.do_divb_cleaning:
            G = yee.evolve_g(G, fields, geom, 0.5 * dt, algo)
        fields = yee.evolve_b(fields, geom, 0.5 * dt, algo)
        if cfg.do_divb_cleaning:
            fields = yee.add_grad_g(fields, G, geom, 0.5 * dt, algo)
        fields = fields.replace(F=F, G=G)

    return fields
