"""ADK field ionization (tunnel ionization creating electrons from ions).

Reimplements the reference's ionization module:
  * ADK rate coefficients (PhysicalParticleContainer::InitIonizationModule,
    PhysicalParticleContainer.cpp — Chen, JCP 236 (2013) eq. 2 prefactors)
  * per-particle ionization probability from the E-field magnitude in the
    particle frame (ElementaryProcess/Ionization.H:95-155)
  * filter-copy-transform particle creation: each ionization event raises the
    ion's ionizationLevel and adds one product electron with the ion's
    position/momentum/weight (ParticleCreation/FilterCopyTransform.H).

Ionization energies (eV) from the NIST table vendored by the reference
(Source/Utils/Physics/IonizationEnergiesTable.H).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants

__all__ = ["IONIZATION_ENERGIES", "adk_coefficients", "ionization_probability"]

# eV per charge state (NIST); subset of the reference's table
IONIZATION_ENERGIES: Dict[str, Tuple[float, ...]] = {
    "H": (13.59843449,),
    "He": (24.58738880, 54.4177650),
    "Li": (5.39171495, 75.6400964, 122.4543581),
    "Be": (9.322699, 18.21115, 153.896203, 217.7185843),
    "B": (8.298019, 25.15483, 37.93058, 259.3715, 340.226020),
    "C": (11.2602880, 24.383154, 47.88778, 64.49352, 392.090515, 489.993194),
    "N": (14.53413, 29.60125, 47.4453, 77.4735, 97.8901, 552.06732, 667.046116),
    "O": (
        13.618055, 35.12112, 54.93554, 77.41350, 113.8990, 138.1189,
        739.32682, 871.40988,
    ),
    "Ne": (
        21.564540, 40.96297, 63.4233, 97.1900, 126.247, 157.934, 207.271,
        239.0970, 1195.80783, 1362.19915,
    ),
    "Ar": (
        15.7596117, 27.62967, 40.735, 59.58, 74.84, 91.290, 124.41, 143.4567,
        422.60, 479.76, 540.4, 619.0, 685.5, 755.13, 855.5, 918.375,
        4120.6656, 4426.2228,
    ),
}


def adk_coefficients(element: str, dt: float):
    """(prefactor, exp_prefactor, power) per charge state, *including* the dt
    factor, exactly as InitIonizationModule computes them."""
    energies = np.array(IONIZATION_ENERGIES[element])
    alpha = constants.alpha
    a3 = alpha**3
    a4 = a3 * alpha
    wa = a3 * constants.c / constants.r_e
    Ea = constants.m_e * constants.c**2 / constants.q_e * a4 / constants.r_e
    UH = IONIZATION_ENERGIES["H"][0]
    l_eff = math.sqrt(UH / energies[0]) - 1.0

    Z = energies.shape[0]
    prefactor = np.zeros(Z)
    exp_prefactor = np.zeros(Z)
    power = np.zeros(Z)
    for i in range(Z):
        n_eff = (i + 1) * math.sqrt(UH / energies[i])
        C2 = 2.0 ** (2 * n_eff) / (
            n_eff * math.gamma(n_eff + l_eff + 1.0) * math.gamma(n_eff - l_eff)
        )
        power[i] = -(2.0 * n_eff - 1.0)
        Uion = energies[i]
        prefactor[i] = (
            dt * wa * C2 * (Uion / (2.0 * UH))
            * (2.0 * (Uion / UH) ** 1.5 * Ea) ** (2.0 * n_eff - 1.0)
        )
        exp_prefactor[i] = -2.0 / 3.0 * (Uion / UH) ** 1.5 * Ea
    return jnp.asarray(prefactor), jnp.asarray(exp_prefactor), jnp.asarray(power)


def ionization_probability(
    ion_lev, ux, uy, uz, ex, ey, ez, bx, by, bz,
    prefactor, exp_prefactor, power, atomic_number: int,
):
    """Per-particle ionization probability this step (Ionization.H:95-150)."""
    c2_inv = constants.inv_c2
    ga = jnp.sqrt(1.0 + (ux * ux + uy * uy + uz * uz) * c2_inv)
    udotE = ux * ex + uy * ey + uz * ez
    E = jnp.sqrt(
        jnp.maximum(
            -udotE * udotE * c2_inv
            + (ga * ex + uy * bz - uz * by) ** 2
            + (ga * ey + uz * bx - ux * bz) ** 2
            + (ga * ez + ux * by - uy * bx) ** 2,
            0.0,
        )
    )
    lev = jnp.clip(ion_lev, 0, atomic_number - 1)
    pre = prefactor[lev]
    expp = exp_prefactor[lev]
    pw = power[lev]
    E_safe = jnp.where(E > 0.0, E, 1.0)
    w_dtau = jnp.where(
        E > 0.0, (1.0 / ga) * pre * E_safe**pw * jnp.exp(expp / E_safe), 0.0
    )
    p = 1.0 - jnp.exp(-w_dtau)
    return jnp.where(ion_lev < atomic_number, p, 0.0)


def apply_ionization(
    rng_key,
    ion_state,
    electron_state,
    e6,
    coeffs,
    atomic_number: int,
):
    """One ionization substep: returns (new_ion_state, new_electron_state, key).

    e6: gathered (ex..bz) at the ion positions.  Products copy the ion's
    position/momentum/weight.
    """
    prefactor, exp_prefactor, power = coeffs
    ion_lev = ion_state.extra["ionizationLevel"]
    p = ionization_probability(
        ion_lev, ion_state.ux, ion_state.uy, ion_state.uz, *e6,
        prefactor, exp_prefactor, power, atomic_number,
    )
    key, sub = jax.random.split(rng_key)
    draw = jax.random.uniform(sub, p.shape, dtype=p.dtype)
    ionized = ion_state.alive & (draw < p)
    new_ion = ion_state.replace(
        extra={**ion_state.extra,
               "ionizationLevel": ion_lev + ionized.astype(ion_lev.dtype)}
    )

    # place product electrons into free slots
    cap_e = electron_state.capacity
    n_ions = ion_state.capacity
    src_idx = jnp.nonzero(ionized, size=n_ions, fill_value=n_ions)[0]
    valid = src_idx < n_ions
    free_idx = jnp.nonzero(~electron_state.alive, size=n_ions, fill_value=cap_e)[0]
    placeable = valid & (free_idx < cap_e)
    tgt = jnp.where(placeable, free_idx, cap_e)
    src = jnp.minimum(src_idx, n_ions - 1)

    def put(dst_arr, src_arr):
        return dst_arr.at[tgt].set(src_arr[src], mode="drop")

    es = electron_state
    es = es.replace(
        w=put(es.w, ion_state.w),
        ux=put(es.ux, ion_state.ux),
        uy=put(es.uy, ion_state.uy),
        uz=put(es.uz, ion_state.uz),
        alive=es.alive.at[tgt].set(
            jnp.where(placeable, True, False), mode="drop"
        ),
    )
    ndim = 1 if ion_state.x is None else (2 if ion_state.y is None else 3)
    pos_i = ion_state.positions(ndim)
    pos_e = list(es.positions(ndim))
    for d in range(ndim):
        pos_e[d] = put(pos_e[d], pos_i[d])
    es = es.with_positions(ndim, pos_e)
    if es.extra:
        extra = dict(es.extra)
        for k in extra:
            # runtime attributes of products default to 0 (reference:
            # DefaultInitialization.H) unless they mirror an ion attribute
            extra[k] = extra[k].at[tgt].set(0, mode="drop")
        es = es.replace(extra=extra)
    return new_ion, es, key
