"""DSMC binary collisions between kinetic species.

Reimplements the reference's DSMC module (reference:
Source/Particles/Collision/BinaryCollision/DSMC/DSMCFunc.H +
SplitAndScatterFunc.H): per-cell pairs collide with probability
1 - exp(-mult_ratio w_max sigma_tot(E_COM) v_rel dt / dV) (the Higginson
2019 scheme shared with nuclear fusion), then scatter by one of the
configured processes chosen in proportion to its partial cross section:

  * elastic        — isotropic redirection of the COM momentum;
  * back           — reversal of the COM momentum;
  * charge_exchange — velocity swap (identical-mass partners).

Cross sections sigma(E) are tabulated (energy [eV], sigma [m^2]) — the
reference reads the same two-column files (warpx-data).  Unequal weights:
the reference splits particles (SplitAndScatterFunc); here the momentum
update is applied to each partner with probability w_other/w_max (the
Nanbu/Perez unequal-weight scheme already used by the Coulomb module) —
statistically equivalent mean momentum transfer without particle splitting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from .fusion import _pairs_for, collision_parameters, _isotropic

__all__ = ["dsmc_collision_update", "load_cross_section"]

_c = constants.c
_c2 = _c * _c
_q_e = constants.q_e


def load_cross_section(path: str):
    """(energies_eV, sigmas_m2) from a two-column whitespace table."""
    data = np.loadtxt(path)
    return np.asarray(data[:, 0], float), np.asarray(data[:, 1], float)


def _interp_sigma(E_eV, table):
    en, sg = table
    return jnp.interp(E_eV, jnp.asarray(en), jnp.asarray(sg),
                      left=0.0, right=float(sg[-1]))


def _com_scatter(u1, m1, u2, m2, key, mode):
    """Scatter the pair in its COM frame, conserving |p*| (elastic/back)
    or swapping velocities (charge exchange).  Returns (u1', u2')."""
    g1 = jnp.sqrt(1.0 + sum(u * u for u in u1) / _c2)
    g2 = jnp.sqrt(1.0 + sum(u * u for u in u2) / _c2)
    p1 = tuple(m1 * u for u in u1)
    p_tot = tuple(m1 * a + m2 * b for a, b in zip(u1, u2))
    mass_g = m1 * g1 + m2 * g2
    vc = tuple(p / mass_g for p in p_tot)
    vc_sq = sum(v * v for v in vc)
    gc = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vc_sq / _c2, 1e-300))
    # momentum of particle 1 in the COM frame (Perez 2012 eq. 12)
    vcDp = sum(v * p for v, p in zip(vc, p1))
    fac = (gc - 1.0) / jnp.maximum(vc_sq, 1e-300) * vcDp - gc * m1 * g1
    p1s = tuple(p + v * fac for p, v in zip(p1, vc))
    p_star = jnp.sqrt(sum(p * p for p in p1s))
    if mode == "elastic":
        p1s_new = _isotropic(key, p_star)
    elif mode == "back":
        p1s_new = tuple(-p for p in p1s)
    else:
        raise ValueError(mode)
    # boost back (Perez 2012 eq. 13)
    g1s = jnp.sqrt(1.0 + sum(p * p for p in p1s_new) / (m1 * m1 * _c2))
    vcDps = sum(v * p for v, p in zip(vc, p1s_new))
    fac2 = (gc - 1.0) / jnp.maximum(vc_sq, 1e-300) * vcDps + m1 * g1s * gc
    p1_new = tuple(p + v * fac2 for p, v in zip(p1s_new, vc))
    p2_new = tuple(pt - p for pt, p in zip(p_tot, p1_new))
    return (
        tuple(p / m1 for p in p1_new),
        tuple(p / m2 for p in p2_new),
    )


def dsmc_collision_update(state, cfg, col, dt, key):
    """One DSMC collision step for CollisionConfig ``col`` (kind='dsmc')."""
    geom = cfg.geometry
    dV = geom.cell_volume
    by_name = {s.name: s for s in cfg.species}
    n1, n2 = col.species
    intra = n1 == n2
    sp1 = state.species[n1]
    sp2 = state.species[n2]
    m1, m2 = by_name[n1].mass, by_name[n2].mass
    k_s1, k_s2, k_ev, k_pick, k_mom, k_a1, k_a2 = jax.random.split(key, 7)

    cell1, order1, starts1, counts1, nct = _pairs_for(sp1, geom, k_s1, intra)
    if intra:
        cell2, order2, starts2, counts2 = cell1, order1, starts1, counts1
    else:
        cell2, order2, starts2, counts2, _ = _pairs_for(
            sp2, geom, k_s2, intra)

    capL = sp1.capacity
    j = jnp.arange(capL)
    cL = cell1[order1]
    rank = j - starts1[jnp.clip(cL, 0, nct)].astype(j.dtype)
    origL = order1
    if intra:
        N = counts1[jnp.clip(cL, 0, nct)].astype(j.dtype)
        half = (N + 1) // 2
        is_pair = rank < (N // 2)
        partner_rank = rank + half
        mult_ratio = jnp.maximum(N - 1, 1)
    else:
        N2c = counts2[jnp.clip(cL, 0, nct)].astype(j.dtype)
        is_pair = N2c > 0
        partner_rank = jnp.where(N2c > 0, rank % jnp.maximum(N2c, 1), 0)
        mult_ratio = jnp.minimum(
            jnp.maximum(counts1[jnp.clip(cL, 0, nct)].astype(j.dtype), 1),
            jnp.maximum(N2c, 1),
        )
    ok = sp1.alive[origL] & is_pair & (cL < nct)
    slotS = jnp.clip(
        starts2[jnp.clip(cL, 0, nct)].astype(j.dtype) + partner_rank,
        0, sp2.capacity - 1,
    )
    origS = order2[slotS]
    ok = ok & sp2.alive[origS]

    u1 = (sp1.ux[origL], sp1.uy[origL], sp1.uz[origL])
    u2 = (sp2.ux[origS], sp2.uy[origS], sp2.uz[origS])
    w1 = sp1.w[origL]
    w2 = sp2.w[origS]
    E_kin, v_rel, lab2com = collision_parameters(u1, u2, m1, m2)
    E_eV = E_kin / _q_e

    sigmas = [
        _interp_sigma(E_eV, (p.energies, p.sigmas)) for p in col.processes
    ]
    sigma_tot = sum(sigmas) if sigmas else jnp.zeros_like(E_eV)
    w_max = jnp.maximum(w1, w2)
    prob = -jnp.expm1(
        -mult_ratio.astype(w1.dtype) * w_max * sigma_tot * v_rel * dt / dV
        * lab2com
    )
    r = jax.random.uniform(k_ev, prob.shape, prob.dtype)
    collide = ok & (r < prob)

    # choose the process proportionally to its partial cross section
    pick = jax.random.uniform(k_pick, prob.shape, prob.dtype) * jnp.maximum(
        sigma_tot, 1e-300
    )
    u1n, u2n = u1, u2
    acc = jnp.zeros_like(sigma_tot)
    for p, sg in zip(col.processes, sigmas):
        sel = collide & (pick >= acc) & (pick < acc + sg)
        acc = acc + sg
        if p.kind == "charge_exchange":
            c1n, c2n = u2, u1
        else:
            mode = "back" if p.kind == "back" else "elastic"
            c1n, c2n = _com_scatter(
                u1, m1, u2, m2, jax.random.fold_in(k_mom, {"elastic": 1, "back": 2}.get(p.kind, 3)),
                mode,
            )
        u1n = tuple(jnp.where(sel, a, b) for a, b in zip(c1n, u1n))
        u2n = tuple(jnp.where(sel, a, b) for a, b in zip(c2n, u2n))

    # unequal weights: apply each partner's update with prob w_other/w_max
    a1 = jax.random.uniform(k_a1, prob.shape, prob.dtype) < (w2 / w_max)
    a2 = jax.random.uniform(k_a2, prob.shape, prob.dtype) < (w1 / w_max)
    upd1 = collide & a1
    upd2 = collide & a2

    def scat(base, idx, vals, mask):
        return base.at[idx].set(jnp.where(mask, vals, base[idx]))

    sp1n = sp1.replace(
        ux=scat(sp1.ux, origL, u1n[0], upd1),
        uy=scat(sp1.uy, origL, u1n[1], upd1),
        uz=scat(sp1.uz, origL, u1n[2], upd1),
    )
    species_mut = dict(state.species)
    species_mut[n1] = sp1n
    sp2b = species_mut[n2] if intra else sp2
    if intra:
        sp2b = sp1n
    sp2n = sp2b.replace(
        ux=scat(sp2b.ux, origS, u2n[0], upd2),
        uy=scat(sp2b.uy, origS, u2n[1], upd2),
        uz=scat(sp2b.uz, origS, u2n[2], upd2),
    )
    species_mut[n2] = sp2n
    return state.replace(species=species_mut)
