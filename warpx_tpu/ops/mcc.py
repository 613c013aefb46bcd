"""Background Monte-Carlo collisions (MCC) against a neutral gas.

TPU-native re-design of the reference's null-collision MCC
(Source/Particles/Collision/BackgroundMCC/BackgroundMCCCollision.cpp,
ImpactIonization.H): every particle draws against the fixed total collision
probability 1 - exp(-nu_max dt) (null-collision method), the colliding subset
picks a process by cumulative normalized frequency, and the scatter applies
the reference kinematics exactly:

  * elastic / excitation: isotropic re-emission in the COM frame
    (ParticleUtils::RandomizeVelocity after doLorentzTransform);
  * back: COM velocity negation (cos(chi) = -1);
  * charge_exchange: swap with the sampled Maxwellian target velocity;
  * excitation / ionization: energy penalty removed via the relativistic
    momentum rescale (BackgroundMCCCollision.cpp:432-441);
  * ionization: a secondary electron + ion pair is created, the available
    energy split evenly between the two electrons, both re-emitted
    isotropically; the ion samples the background Maxwellian
    (ImpactIonization.H:168-260).

Cross sections are two-column (energy_eV, sigma_m2) tables on a UNIFORM
energy grid (ScatteringProcess.cpp:96 readCrossSectionFile), clamped to the
end values outside the range (ScatteringProcess.H:81-99).  Tables live as
device arrays; lookups are vectorized gathers — no data-dependent control
flow, so the whole collision pass stays inside jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import c as _c, kb as _kb, q_e as _q_e

__all__ = [
    "load_cross_section", "mcc_nu_max", "apply_mcc_scattering",
    "apply_mcc_ionization", "total_collision_prob",
]


def load_cross_section(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a two-column cross-section file (energy eV, sigma m^2); the
    energy grid must be uniform (ScatteringProcess.cpp:96)."""
    data = np.loadtxt(path)
    if data.ndim != 2 or data.shape[1] < 2:
        raise ValueError(f"bad cross-section file {path!r}")
    e, s = data[:, 0].astype(float), data[:, 1].astype(float)
    de = np.diff(e)
    if de.size and not np.allclose(de, de[0], rtol=1e-5):
        raise ValueError(
            f"cross-section energy grid in {path!r} is not uniform"
        )
    return e, s


def _sigma_at(E_eV, energies: Tuple[float, ...], sigmas_arr):
    """Clamped linear interpolation on the uniform energy grid
    (ScatteringProcess.H:81-99)."""
    e_lo = energies[0]
    e_hi = energies[-1]
    n = len(energies)
    dE = (e_hi - e_lo) / (n - 1) if n > 1 else 1.0
    t = jnp.clip((E_eV - e_lo) / dE, 0.0, float(n - 1))
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2 if n > 1 else 0)
    frac = t - i0
    return sigmas_arr[i0] * (1.0 - frac) + sigmas_arr[
        jnp.minimum(i0 + 1, n - 1)
    ] * frac


def mcc_nu_max(processes, mass: float, max_density: float) -> float:
    """Host-side maximum collision frequency over the fixed energy sweep
    1e-4..5000 eV step 0.2 eV, widened by the table limits
    (BackgroundMCCCollision.cpp:165-206)."""
    E_start, E_end, E_step = 1e-4, 5000.0, 0.2
    for p in processes:
        E_start = min(E_start, p.energies[0])
        E_end = max(E_end, p.energies[-1])
        n = len(p.energies)
        if n > 1:
            E_step = min(
                E_step, (p.energies[-1] - p.energies[0]) / (n - 1)
            )
    E = np.arange(E_start, E_end, E_step)
    sigma = np.zeros_like(E)
    for p in processes:
        en = np.asarray(p.energies)
        sg = np.asarray(p.sigmas)
        t = np.clip((E - en[0]) / ((en[-1] - en[0]) / (len(en) - 1)), 0,
                    len(en) - 1)
        i0 = np.clip(np.floor(t).astype(int), 0, max(len(en) - 2, 0))
        frac = t - i0
        sigma += sg[i0] * (1 - frac) + sg[np.minimum(i0 + 1, len(en) - 1)] * frac
    nu = max_density * math.sqrt(2.0 / mass * _q_e) * sigma * np.sqrt(E)
    return float(nu.max()) if nu.size else 0.0


def total_collision_prob(nu_max: float, dt: float) -> float:
    return 1.0 - math.exp(-nu_max * dt)


def _collision_energy(v2, m, M):
    """Two-body collision energy in eV (ParticleUtils::getCollisionEnergy)."""
    gamma = jnp.sqrt(1.0 + v2 / (_c * _c))
    energy = (
        2.0 * m * M * v2 / (gamma + 1.0)
        / (M + m + jnp.sqrt(m * m + M * M + 2.0 * m * M * gamma))
    ) / _q_e
    return gamma, energy


def _energy_eV(u2, m):
    """Kinetic energy of a proper-velocity-u particle in eV
    (ParticleUtils::getEnergy)."""
    gamma = jnp.sqrt(1.0 + u2 / (_c * _c))
    return m * (_c * _c) * (gamma - 1.0) / _q_e


def _lorentz(ux, uy, uz, Vx, Vy, Vz, sign=1.0):
    """Boost proper velocity u into a frame moving at velocity V
    (ParticleUtils::doLorentzTransform); sign=-1 boosts back."""
    Vx, Vy, Vz = sign * Vx, sign * Vy, sign * Vz
    V2 = Vx * Vx + Vy * Vy + Vz * Vz
    V2s = jnp.where(V2 == 0.0, 1.0, V2)
    gV = 1.0 / jnp.sqrt(1.0 - V2 / (_c * _c))
    gu = jnp.sqrt(1.0 + (ux * ux + uy * uy + uz * uz) / (_c * _c))
    f = (gV - 1.0) / V2s
    nx = ux * (1.0 + f * Vx * Vx) + uy * f * Vx * Vy + uz * f * Vx * Vz \
        - gV * Vx * gu
    ny = uy * (1.0 + f * Vy * Vy) + ux * f * Vx * Vy + uz * f * Vy * Vz \
        - gV * Vy * gu
    nz = uz * (1.0 + f * Vz * Vz) + ux * f * Vx * Vz + uy * f * Vy * Vz \
        - gV * Vz * gu
    keep = V2 == 0.0
    return (
        jnp.where(keep, ux, nx),
        jnp.where(keep, uy, ny),
        jnp.where(keep, uz, nz),
    )


def _random_unit(key, shape, dtype):
    """Isotropic unit vectors (ParticleUtils::getRandomVector)."""
    k1, k2 = jax.random.split(key)
    ct = jax.random.uniform(k1, shape, dtype, -1.0, 1.0)
    phi = jax.random.uniform(k2, shape, dtype, 0.0, 2.0 * np.pi)
    st = jnp.sqrt(1.0 - ct * ct)
    return st * jnp.cos(phi), st * jnp.sin(phi), ct


def _eval_bg(expr_fn, pos3, t, fallback):
    if expr_fn is None:
        return fallback
    return expr_fn(pos3[0], pos3[1], pos3[2], t)


def apply_mcc_scattering(
    key,
    sp,
    ndim: int,
    t,
    *,
    m: float,
    M: float,
    processes: Sequence,
    n_a_fn,
    T_a_fn,
    nu_max: float,
    p_coll: float,
    dtype,
):
    """Particle-conserving MCC pass (elastic/back/charge_exchange/excitation)
    on one species; returns the updated ParticleState.

    processes: configs with .kind, .energy_penalty, .energies, .sigmas
    n_a_fn/T_a_fn: compiled f(x,y,z,t) expressions (None -> constants are
    baked into p_coll via max density; reference evaluates locally).
    """
    if not processes:
        return sp
    cap = sp.w.shape[0]
    keys = jax.random.split(key, 5)
    pos = sp.positions(ndim)
    # xyz triple for the background functions (inactive dims at 0)
    pos3 = [jnp.zeros(cap, dtype)] * 3
    axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    for a, arr in zip(axes, pos):
        pos3[a] = arr
    n_a = _eval_bg(n_a_fn, pos3, t, None)
    T_a = _eval_bg(T_a_fn, pos3, t, None)

    r_coll = jax.random.uniform(keys[0], (cap,), dtype)
    collide = sp.alive & (r_coll <= p_coll)

    # sample target (neutral) velocity from the local Maxwellian
    vel_std = jnp.sqrt(_kb * T_a / M)
    na = jax.random.normal(keys[1], (3, cap), dtype)
    ua_x, ua_y, ua_z = vel_std * na[0], vel_std * na[1], vel_std * na[2]

    # Galilean boost into the target rest frame (the target is assumed
    # non-relativistic, BackgroundMCCCollision.cpp:384-391)
    vx = sp.ux - ua_x
    vy = sp.uy - ua_y
    vz = sp.uz - ua_z
    v2 = vx * vx + vy * vy + vz * vz
    v_coll = jnp.sqrt(v2)
    gamma, E_coll = _collision_energy(v2, m, M)

    col_select = jax.random.uniform(keys[2], (cap,), dtype)
    nu_cum = jnp.zeros(cap, dtype)
    chosen = jnp.full(cap, -1, jnp.int32)
    sigma_list = []
    for i, proc in enumerate(processes):
        sig = _sigma_at(E_coll, proc.energies, jnp.asarray(proc.sigmas,
                                                           dtype))
        sigma_list.append(sig)
        nu_cum = nu_cum + n_a * sig * v_coll / nu_max
        newly = collide & (chosen < 0) & (col_select <= nu_cum)
        chosen = jnp.where(newly, i, chosen)

    # COM frame velocity (the penalty rescale below does not change it:
    # the reference computes uCOM from the pre-penalty velocity)
    uCOM_x = m * vx / (gamma * m + M)
    uCOM_y = m * vy / (gamma * m + M)
    uCOM_z = m * vz / (gamma * m + M)

    ex_, ey_, ez_ = _random_unit(keys[3], (cap,), dtype)

    mc2 = m * _c * _c
    new_ux, new_uy, new_uz = sp.ux, sp.uy, sp.uz
    for i, proc in enumerate(processes):
        sel = chosen == i
        if proc.kind == "charge_exchange":
            new_ux = jnp.where(sel, ua_x, new_ux)
            new_uy = jnp.where(sel, ua_y, new_uy)
            new_uz = jnp.where(sel, ua_z, new_uz)
            continue
        wx, wy, wz = vx, vy, vz
        if proc.energy_penalty > 0.0:
            E1 = _energy_eV(v2, m)
            Ep = (E1 - proc.energy_penalty) * _q_e
            Ep = jnp.maximum(Ep, 0.0)
            scale = jnp.sqrt(Ep * (Ep + 2.0 * mc2) / (_c * _c)) / m / \
                jnp.where(v_coll == 0.0, 1.0, v_coll)
            wx, wy, wz = wx * scale, wy * scale, wz * scale
        bx, by, bz = _lorentz(wx, wy, wz, uCOM_x, uCOM_y, uCOM_z)
        if proc.kind == "back":
            bx, by, bz = -bx, -by, -bz
        else:  # elastic / excitation: isotropic in COM
            vp = jnp.sqrt(bx * bx + by * by + bz * bz)
            bx, by, bz = ex_ * vp, ey_ * vp, ez_ * vp
        bx, by, bz = _lorentz(bx, by, bz, uCOM_x, uCOM_y, uCOM_z, sign=-1.0)
        new_ux = jnp.where(sel, bx + ua_x, new_ux)
        new_uy = jnp.where(sel, by + ua_y, new_uy)
        new_uz = jnp.where(sel, bz + ua_z, new_uz)

    return sp.replace(ux=new_ux, uy=new_uy, uz=new_uz)


def apply_mcc_ionization(
    key,
    sp_e,
    sp_ion,
    ndim: int,
    t,
    *,
    m: float,
    M_bg: float,
    proc,
    n_a_fn,
    T_a_fn,
    nu_max_ioniz: float,
    p_coll_ioniz: float,
    dtype,
):
    """Impact-ionization pass: source electrons lose the ionization energy,
    secondary electron+ion pairs are created (ImpactIonization.H).  Returns
    (new_electron_state, new_ion_state)."""
    cap = sp_e.w.shape[0]
    keys = jax.random.split(key, 6)
    pos = sp_e.positions(ndim)
    pos3 = [jnp.zeros(cap, dtype)] * 3
    axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    for a, arr in zip(axes, pos):
        pos3[a] = arr
    n_a = _eval_bg(n_a_fn, pos3, t, None)
    T_a = _eval_bg(T_a_fn, pos3, t, None)

    r1 = jax.random.uniform(keys[0], (cap,), dtype)
    candidate = sp_e.alive & (r1 <= p_coll_ioniz)
    u2 = sp_e.ux**2 + sp_e.uy**2 + sp_e.uz**2
    E_eV = _energy_eV(u2, m)
    sig = _sigma_at(E_eV, proc.energies, jnp.asarray(proc.sigmas, dtype))
    nu_i = n_a * sig * jnp.sqrt(u2) / nu_max_ioniz
    r2 = jax.random.uniform(keys[1], (cap,), dtype)
    ionized = candidate & (r2 <= nu_i)

    mc2 = m * _c * _c
    E_out = jnp.maximum((E_eV - proc.energy_penalty) * 0.5 * _q_e, 0.0)
    up = jnp.sqrt(E_out * (E_out + 2.0 * mc2) / (_c * _c)) / m

    # primary electron: isotropic re-emission at the shared energy
    e1x, e1y, e1z = _random_unit(keys[2], (cap,), dtype)
    new_ux = jnp.where(ionized, e1x * up, sp_e.ux)
    new_uy = jnp.where(ionized, e1y * up, sp_e.uy)
    new_uz = jnp.where(ionized, e1z * up, sp_e.uz)
    sp_e = sp_e.replace(ux=new_ux, uy=new_uy, uz=new_uz)

    # secondary electron velocities / ion Maxwellian samples (per source)
    e2x, e2y, e2z = _random_unit(keys[3], (cap,), dtype)
    sec_ux, sec_uy, sec_uz = e2x * up, e2y * up, e2z * up
    ion_std = jnp.sqrt(_kb * T_a / M_bg)
    ni = jax.random.normal(keys[4], (3, cap), dtype)
    ion_ux, ion_uy, ion_uz = ion_std * ni[0], ion_std * ni[1], ion_std * ni[2]

    def emit(dst, src_vals_u, mask):
        """Masked-emit mask-selected source rows into free slots of dst."""
        cap_d = dst.w.shape[0]
        src_idx = jnp.nonzero(mask, size=cap, fill_value=cap)[0]
        valid = src_idx < cap
        free_idx = jnp.nonzero(~dst.alive, size=cap, fill_value=cap_d)[0]
        placeable = valid & (free_idx < cap_d)
        tgt = jnp.where(placeable, free_idx, cap_d)
        src = jnp.minimum(src_idx, cap - 1)

        def put(dst_arr, src_arr):
            return dst_arr.at[tgt].set(src_arr[src], mode="drop")

        sux, suy, suz = src_vals_u
        out = dst.replace(
            w=put(dst.w, sp_e.w),
            ux=put(dst.ux, sux),
            uy=put(dst.uy, suy),
            uz=put(dst.uz, suz),
            alive=dst.alive.at[tgt].set(
                jnp.where(placeable, True, False), mode="drop"
            ),
        )
        pos_d = list(out.positions(ndim))
        for d in range(ndim):
            pos_d[d] = put(pos_d[d], pos[d])
        out = out.with_positions(ndim, pos_d)
        if out.extra:
            extra = {
                k: v.at[tgt].set(jnp.zeros((), v.dtype), mode="drop")
                for k, v in out.extra.items()
            }
            out = out.replace(extra=extra)
        return out

    sp_e = emit(sp_e, (sec_ux, sec_uy, sec_uz), ionized)
    sp_ion = emit(sp_ion, (ion_ux, ion_uy, ion_uz), ionized)
    return sp_e, sp_ion


def mcc_collision_update(state, cfg, dt):
    """Apply all background_mcc collisions for this step (doCollisions slot).

    Returns the updated SimState.  Probabilities/nu_max are host-side
    trace-time constants (BackgroundMCCCollision.cpp:225-266); the particle
    pass is fully vectorized under jit.
    """
    from ..utils.expression import compile_expression

    mcc_cols = [c for c in cfg.collisions if c.kind == "background_mcc"]
    if not mcc_cols:
        return state
    ndim = cfg.geometry.ndim
    by_name = {s.name: s for s in cfg.species}
    species_mut = dict(state.species)
    rng = state.rng
    dtype = state.fields.Ex.dtype
    uc = dict(cfg.user_constants or ())
    for col in mcc_cols:
        sp_cfg = by_name[col.species[0]]
        sp = species_mut[sp_cfg.name]
        m1 = sp_cfg.mass
        scatter = tuple(
            p for p in col.processes if p.kind != "ionization"
        )
        ioniz = tuple(p for p in col.processes if p.kind == "ionization")
        # background mass: secondary-ion mass when ionizing, else own mass
        # (BackgroundMCCCollision.cpp:258-270)
        if col.background_mass > 0:
            M_bg = col.background_mass
        elif ioniz and col.ionization_species:
            M_bg = by_name[col.ionization_species].mass
        else:
            M_bg = m1
        n_a_fn = compile_expression(
            col.background_density, ("x", "y", "z", "t"), uc
        ) if col.background_density else None
        T_a_fn = compile_expression(
            col.background_temperature, ("x", "y", "z", "t"), uc
        ) if col.background_temperature else None
        dt_coll = dt * col.ndt
        do_now = (state.step % col.ndt) == 0

        if scatter:
            nu_max = mcc_nu_max(scatter, m1, col.max_background_density)
            p_coll = total_collision_prob(nu_max, dt_coll)
            rng, sub = jax.random.split(rng)
            sp = jax.lax.cond(
                do_now,
                lambda s: apply_mcc_scattering(
                    sub, s, ndim, state.time, m=m1, M=M_bg,
                    processes=scatter, n_a_fn=n_a_fn, T_a_fn=T_a_fn,
                    nu_max=nu_max, p_coll=p_coll, dtype=dtype,
                ),
                lambda s: s,
                sp,
            )
        if ioniz:
            nu_max_i = mcc_nu_max(ioniz, m1, col.max_background_density)
            p_coll_i = total_collision_prob(nu_max_i, dt_coll)
            sp_ion = species_mut[col.ionization_species]
            rng, sub = jax.random.split(rng)
            sp, sp_ion = jax.lax.cond(
                do_now,
                lambda ss: apply_mcc_ionization(
                    sub, ss[0], ss[1], ndim, state.time, m=m1, M_bg=M_bg,
                    proc=ioniz[0], n_a_fn=n_a_fn, T_a_fn=T_a_fn,
                    nu_max_ioniz=nu_max_i, p_coll_ioniz=p_coll_i,
                    dtype=dtype,
                ),
                lambda ss: ss,
                (sp, sp_ion),
            )
            species_mut[col.ionization_species] = sp_ion
        species_mut[sp_cfg.name] = sp
    return state.replace(species=species_mut, rng=rng)
